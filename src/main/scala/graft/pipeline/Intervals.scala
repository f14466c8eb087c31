package graft.pipeline

/** Scheduler interval parser (SURVEY.md §2.H2).
  *
  * Accepts the reference's forms (`CopyToolConfig.java:574-642`):
  * `"every 5 minutes"`, `"2 hours"`, `"1 day"`, `"30 seconds"`, or a raw
  * number of seconds. Returns seconds.
  */
object Intervals {
  private val Pattern =
    """(?i)\s*(?:every\s+)?(\d+)\s*(second|minute|hour|day)s?\s*""".r

  def parseSeconds(s: String): Long = s.trim match {
    case Pattern(n, unit) =>
      val mult = unit.toLowerCase match {
        case "second" => 1L
        case "minute" => 60L
        case "hour"   => 3600L
        case "day"    => 86400L
      }
      n.toLong * mult
    case raw if raw.nonEmpty && raw.forall(_.isDigit) => raw.toLong
    case other =>
      throw new IllegalArgumentException(s"Cannot parse interval '$other'")
  }
}

/** Env-var config substitution (SURVEY.md §2.H6,
  * `CopyToolConfig.java:281-357`): whole-value `ENV:VAR:default` and
  * inline `{env:VAR}` forms. */
object EnvSubst {
  private val Inline = """\{env:([A-Za-z0-9_]+)\}""".r

  def substitute(value: String, env: Map[String, String] = sys.env): String =
    if (value.startsWith("ENV:")) {
      value.split(":", 3) match {
        case Array(_, name, default) => env.getOrElse(name, default)
        case Array(_, name) => env.getOrElse(name,
          throw new IllegalArgumentException(s"Env var '$name' not set and no default given"))
        case _ => value
      }
    } else Inline.replaceAllIn(value, m =>
      scala.util.matching.Regex.quoteReplacement(env.getOrElse(m.group(1), "")))
}
