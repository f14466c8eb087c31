package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ConfigBridge, CopyJob, EmailAlert, PropertiesConfig}

/** The copy tool's command line — parity with the reference's entry
  * point (`CopyTool.java:73-107`, `CopyToolConfig.java:116-249`,
  * `docker-entrypoint.sh:9-30`):
  *
  *   - `-c/--config FILE` (repeatable): each file is one job; multiple
  *     files run in order and one failure never stops the fleet (the
  *     entrypoint's loop, H4 — in one JVM, so the Spark session and its
  *     caches are shared across jobs);
  *   - `--no-switch` / `-ns`, `--switch-only` / `-so` (E6); `--resume`
  *     continues from intact durable staging without re-extracting
  *     (the staging-triplet crash recovery, SURVEY §3.1 — our pipeline's
  *     addition, no reference flag);
  *   - the pure-CLI single-table switch (`CopyToolConfig.java:219-249`):
  *     `--switch-only --monetdb-table T` plus `--target-dir DIR` — the
  *     FS twin of the reference's six `--monetdb-*` connection options —
  *     repoints `T`'s `current` pointer at its newest version with no
  *     config file at all (the other `--monetdb-*` options are accepted
  *     for flag parity and unused by the filesystem twin);
  *   - exit codes: 0 copied, 1 error, 2 no new data
  *     (`CopyTool.java:66-68`);
  *   - `scheduler.interval` in the (single) config ⇒ run forever at
  *     that interval, staying alive through failures
  *     (`CopyTool.java:122-160`); `--max-runs N` bounds it for tests;
  *   - `mail.enabled=true` + `mail.*` in the config ⇒ failures are
  *     mailed before the tool exits, like `EmailUtil.sendMail` on the
  *     reference's catch-all path.
  *
  * `main` is a thin `System.exit(run(...))` wrapper; [[run]] carries
  * the whole behavior and is what the e2e spec drives. */
object Main {

  final case class Cli(
      configs: Seq[String] = Vector.empty,
      noSwitch: Boolean = false,
      switchOnly: Boolean = false,
      resume: Boolean = false,
      opts: Map[String, String] = Map.empty,
      maxRuns: Option[Int] = None)

  private val valueOpts = Set(
    "c", "config", "target-dir", "max-runs",
    "monetdb-table", "monetdb-schema", "monetdb-db", "monetdb-user",
    "monetdb-password", "monetdb-server", "monetdb-port")

  val usage: String =
    """usage: graft.Main -c CONFIG.properties [-c MORE.properties ...]
      |                  [--no-switch | --switch-only] [--resume] [--max-runs N]
      |   or: graft.Main --switch-only --monetdb-table T --target-dir DIR
      |--resume: skip re-extract, continue from intact durable staging
      |          (crash recovery between the extract and load phases)
      |exit codes: 0 = copied, 1 = error, 2 = no new data""".stripMargin

  def parseArgs(args: Array[String]): Either[String, Cli] = {
    var cli = Cli()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      val key = a.dropWhile(_ == '-')
      val isOpt = a.startsWith("-")
      if (!isOpt) return Left(s"unexpected argument '$a'")
      key match {
        case "ns" | "no-switch"   => cli = cli.copy(noSwitch = true)
        case "so" | "switch-only" => cli = cli.copy(switchOnly = true)
        case "resume"             => cli = cli.copy(resume = true)
        case k if valueOpts(k) =>
          if (i + 1 >= args.length) return Left(s"option '$a' requires a value")
          val v = args(i + 1); i += 1
          k match {
            case "c" | "config" => cli = cli.copy(configs = cli.configs :+ v)
            case "max-runs" =>
              v.toIntOption match {
                case Some(n) if n > 0 => cli = cli.copy(maxRuns = Some(n))
                case _ => return Left(s"--max-runs needs a positive int, got '$v'")
              }
            case other => cli = cli.copy(opts = cli.opts + (other -> v))
          }
        case _ => return Left(s"unknown option '$a'")
      }
      i += 1
    }
    if (cli.noSwitch && cli.switchOnly)
      Left("--no-switch and --switch-only are mutually exclusive")
    else if (cli.resume && cli.switchOnly)
      Left("--resume re-loads staging into a new snapshot; --switch-only " +
        "publishes without touching data — the combination is contradictory")
    else if (cli.configs.isEmpty && !(cli.switchOnly && cli.opts.contains("monetdb-table")))
      Left("at least one -c CONFIG required (or --switch-only --monetdb-table T --target-dir DIR)")
    else Right(cli)
  }

  /** One parsed config file: the raw key→value map (for `graft.*` and
    * `mail.*` keys the typed model doesn't carry) + the typed parse. */
  private def loadConfig(path: String): (Map[String, String], PropertiesConfig.Parsed) = {
    val f = new java.io.File(path)
    if (!f.exists()) throw ConfigBridge.BridgeException(s"config file '$path' does not exist")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    (PropertiesConfig.parseProperties(text), PropertiesConfig.parseOrFail(text))
  }

  /** The whole tool behind the exit code; `log` is injectable so specs
    * run silent. */
  def run(args: Array[String], spark: SparkSession,
      log: String => Unit = System.err.println): Int = {
    parseArgs(args) match {
      case Left(err) =>
        log(s"ERROR: $err"); log(usage); 1
      case Right(cli) if cli.configs.isEmpty =>
        // pure-CLI single-table switch: no config file, just repoint
        val table = cli.opts("monetdb-table")
        cli.opts.get("target-dir") match {
          case None =>
            log("ERROR: --switch-only --monetdb-table needs --target-dir " +
              "(the filesystem twin of the --monetdb-* connection options)")
            1
          case Some(root) =>
            graft.pipeline.Publish.publishNewest(root, table) match {
              case Some(v) => log(s"switched '$table' to version $v"); 0
              case None    => log(s"ERROR: no versions of '$table' under $root"); 1
            }
        }
      case Right(cli) =>
        val loaded =
          try cli.configs.map { p =>
            val (props, parsed) = loadConfig(p)
            parsed.warnings.foreach(w => log(s"WARN [$p]: $w"))
            (p, props, parsed)
          } catch {
            case e: Exception => log(s"ERROR: ${e.getMessage}"); return 1
          }
        val jobs =
          try loaded.map { case (p, props, parsed) =>
            (p, props, ConfigBridge.toJobConfig(parsed, props,
              noSwitch = cli.noSwitch, switchOnly = cli.switchOnly)
              .copy(resumeFromStaging = cli.resume))
          } catch {
            case e: Exception => log(s"ERROR: ${e.getMessage}"); return 1
          }

        // the alert is best-effort: an unreachable SMTP server must not
        // abort the fleet loop or kill the scheduler (the job already
        // failed — losing the other jobs over the failure MAIL would
        // invert the 'one failure never stops the fleet' contract)
        def safeAlert(props: Map[String, String])(f: CopyJob.Failed): Unit =
          try EmailAlert.alertHook(EmailAlert.fromProps(props))(f)
          catch { case e: Exception => log(s"WARN: failure alert not sent: ${e.getMessage}") }

        def runOne(props: Map[String, String], cfg: CopyJob.JobConfig): CopyJob.JobResult =
          CopyJob.runWithAlert(spark, cfg)(safeAlert(props))

        // scheduler mode: single config with scheduler.interval — run
        // forever (or --max-runs for tests), never exiting on failure
        val schedulerInterval = loaded match {
          case Seq((_, _, parsed)) => parsed.schedulerIntervalSeconds
          case _                   => None
        }
        schedulerInterval match {
          case Some(interval) =>
            val (_, props, cfg) = jobs.head
            var last: CopyJob.JobResult = CopyJob.Copied
            // --resume applies to the FIRST scheduled run only: it
            // consumes the staged data (and cleans staging), so later
            // iterations must extract normally — a persistent resume
            // flag would fail every subsequent run on missing staging
            val steady = cfg.copy(resumeFromStaging = false)
            CopyJob.runScheduled(spark, steady, interval,
              maxRuns = cli.maxRuns.getOrElse(Int.MaxValue),
              onResult = { r =>
                last = r
                r match {
                  case f: CopyJob.Failed =>
                    log(s"scheduled run failed: ${f.reason}")
                    safeAlert(props)(f)
                  case other => log(s"scheduled run: $other")
                }
              },
              firstRunCfg = if (cli.resume) Some(cfg) else None)
            last.exitCode
          case None =>
            val results = jobs.map { case (p, props, cfg) =>
              val r = runOne(props, cfg)
              log(s"[$p] ${r.getClass.getSimpleName.stripSuffix("$")} (exit ${r.exitCode})")
              r
            }
            // single config exits exactly like the reference; a fleet
            // exits 1 if anything failed, 2 only when EVERY job saw no
            // new data, else 0
            if (results.exists(_.exitCode == 1)) 1
            else if (results.forall(_.exitCode == 2)) 2
            else 0
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .appName("graft-copy-tool")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // spark-submit provides the master; standalone `java -cp` runs local
    val withMaster =
      if (sys.props.contains("spark.master")) builder
      else builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = try run(args, spark) finally spark.stop()
    System.exit(code)
  }
}
