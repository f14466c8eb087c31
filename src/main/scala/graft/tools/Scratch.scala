package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev scratchpad: phase-by-phase timing of a query under investigation. */
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables(spark, d, "documents")
    println("[scratch] docs rows: " + docs.count())

    // does exchange reuse fire on a trivial agg self-join?
    val agg = docs.groupBy("doc_id").agg(sum(length(col("text"))).as("s"))
    val j = agg.as("x").join(agg.as("y"), Seq("doc_id"))
      .filter(col("x.s") === col("y.s"))
    t("trivial self-join")(j.count())
    val plan = j.queryExecution.executedPlan.toString
    println("[scratch] trivial Reused: " + "Reused".r.findAllIn(plan).size +
      "  Exchange: " + "Exchange".r.findAllIn(plan).size +
      "  QueryStage: " + "QueryStage".r.findAllIn(plan).size)

    val nd = graft.dedup.Dedup.simHashNearDups(docs, "text", "doc_id")
    t("near dups full")(nd.count())
    val p2 = nd.queryExecution.executedPlan.toString
    println("[scratch] nd Reused: " + "Reused".r.findAllIn(p2).size +
      "  Exchange: " + "Exchange".r.findAllIn(p2).size)
    spark.stop()
  }
}
