package graft.tmp
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dup = (0 until 200).map(i => s"d$i").mkString(" ")
    val docA = ((0 until 50).map(i => s"ua$i").mkString(" ")) + " " + dup + " " + ((0 until 50).map(i => s"va$i").mkString(" "))
    val docB = ((0 until 50).map(i => s"ub$i").mkString(" ")) + " " + dup + " " + ((0 until 50).map(i => s"vb$i").mkString(" "))
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    println("n=10:")
    Dedup.duplicateSpans(docs, "text", "doc_id", n = 10).orderBy("doc_id","span_start").show(50, false)
    spark.stop()
  }
}
