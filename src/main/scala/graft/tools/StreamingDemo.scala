package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Dev utility: drive the streaming surface end-to-end on real harness
  * data — incremental copy with checkpoint resume + windowed agg. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("stream_demo")

    // events with ns→µs rebuild, staged once so the file stream sees it
    graft.sources.Tables(spark, dir, "events").write.parquet(s"$base/src")
    EventsStream.incrementalCopy(spark, s"$base/src", s"$base/dst", s"$base/ckp")
    println(s"[stream-demo] copied rows=${spark.read.parquet(s"$base/dst").count()}")
    EventsStream.incrementalCopy(spark, s"$base/src", s"$base/dst", s"$base/ckp")
    println(s"[stream-demo] rerun rows=${spark.read.parquet(s"$base/dst").count()} (no dupes)")

    val schema = spark.read.parquet(s"$base/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/src")
    val agg = EventsStream.windowedAgg(stream, "1 hour", "1 minute")
    val out = EventsStream.runToMemory(spark, agg, "hourly")
    println(s"[stream-demo] hourly windows=${out.count()} " +
      s"events=${out.agg(sum("n")).head().getLong(0)}")
    spark.stop()
  }
}
