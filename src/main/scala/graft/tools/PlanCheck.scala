package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val nd = graft.dedup.Dedup.simHashNearDups(
      graft.sources.Tables(spark, d, "documents"), "text", "doc_id")
    nd.count()
    println(nd.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Stage") || l.contains("Scan"))
      .mkString("\n"))
    spark.stop()
  }
}
