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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    // hot-query breakdown: run each twice — first-run minus second-run
    // is plan/codegen overhead, the second run is the data-bound cost
    for (q <- Seq("q44_lang_id", "q53_minhash_lsh_pairs", "q65_ann_ivf_topk",
        "q52_ngram_jaccard")) {
      val fn = graft.SparkEntry.queries(q)
      t(s"$q run1")(fn(spark, d).count())
      spark.catalog.clearCache()
      t(s"$q run2")(fn(spark, d).count())
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
