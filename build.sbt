ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mssql2monetdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The forked run's stdout must reach the caller RAW: sbt's default
// LoggedOutput prefixes every line with "[info] ", which broke the
// driver's trailing-JSON-line parse of graft.Bench for three rounds
// (BENCH_r12–r14 all "parsed": null — the per-query line was never
// valid JSON from byte 0). StdoutOutput inherits this process's
// stdout/stderr, so the bench's one-line JSON lands unprefixed.
run / outputStrategy := Some(StdoutOutput)
// ...and sbt's own trailing "[success] Total time: ..." line (printed
// AFTER the bench's JSON) must not be the last stdout line either —
// without it the canonical per-query JSON is literally last, so even a
// parse-the-last-line driver succeeds.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // read by sbt's command engine, not a task
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (was 8g): the 174-query bench run holds per-query
  // localCheckpoint blocks until the ContextCleaner catches up, and at
  // 8g the accumulated storage pressure degraded EVERY query ~30%
  // uniformly (measured r14: 229 s at 8g vs 174.7 s at 16g, same HEAD,
  // same machine state — diagnosed via an old-HEAD worktree bench after
  // it first read as a code regression). -Xmx is a cap, not committed
  // memory; override with SPARK_DRIVER_MEM for constrained machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~70 queries of whole-stage-codegen classes overflow the default
  // 240m code cache; once full, the JIT stops compiling and expression-
  // heavy queries run interpreted (10-20x slower, run-order dependent).
  // Reserved (not committed) memory, so oversizing is free.
  "-XX:ReservedCodeCacheSize=1g",
)
