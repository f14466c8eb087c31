package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline._
import graft.pipeline.CopyJob._

/** Dev utility: drive a full copy job end-to-end against the harness
  * star schema — trigger, 4 phases, publish, GC, incremental re-run. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft_demo")
    val cfg = JobConfig(
      tables = Seq(
        TableSpec("lineitem", FromSpec("lineitem"), "lineitem_copy"),
        TableSpec("agg", FromSpec("agg", query = Some(
          """SELECT l_returnflag, l_linestatus, count(*) AS n
            |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)), "lineitem_agg"),
        TableSpec("nation_proj", FromSpec("nation",
          columns = Some(Seq("n_nationkey", "n_name"))), "nation_slim")),
      sourceDir = dir,
      stagingRoot = s"$base/staging",
      targetRoot = s"$base/target",
      stateDir = s"$base/state",
      trigger = Some(TriggerSpec("events", "ts")))

    val r1 = CopyJob.run(spark, cfg)
    println(s"[demo] run1 = $r1 (exit ${r1.exitCode})")
    cfg.tables.foreach { t =>
      val cur = Publish.currentVersion(cfg.targetRoot, t.to)
      val n = Publish.readCurrent(spark, cfg.targetRoot, t.to).count()
      println(s"[demo]   ${t.to}: version=$cur rows=$n")
    }
    val r2 = CopyJob.run(spark, cfg)
    println(s"[demo] run2 (unchanged watermark) = $r2 (exit ${r2.exitCode})")
    val r3 = CopyJob.run(spark, cfg.copy(switchOnly = true))
    println(s"[demo] run3 (switch-only) = $r3 (exit ${r3.exitCode})")
    spark.stop()
  }
}
