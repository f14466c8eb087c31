package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of a named query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
