package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: mirrors the driver's t1 smoke gate (entry rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(20, false)
    println(s"[entry-smoke] rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
