package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Dev utility: print schema + sample rows for every harness table. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { t =>
      println(s"== $t ==")
      val df = Tables(spark, dir, t)
      df.printSchema()
      df.show(2, 60)
    }
    spark.stop()
  }
}
