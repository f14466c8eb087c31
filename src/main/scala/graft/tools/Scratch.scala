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
    val docs = Tables(spark, d, "documents")

    // warmup (same as Bench)
    t("warmup")(docs.select(xxhash64(col("text"))).count())

    // q44 phase breakdown — agg consumers so column pruning can't skip
    // the probed expression (count() alone prunes everything)
    t("scan text len")(docs.agg(sum(length(col("text")))).head())
    t("tokens split")(docs.agg(sum(size(graft.text.TextAnalysis.tokens(lower(col("text")))))).head())
    t("langIdExpr eval")(docs.agg(sum(length(graft.text.TextAnalysis.langIdExpr(col("text"))))).head())
    t("langIdExpr eval2")(docs.agg(sum(length(graft.text.TextAnalysis.langIdExpr(col("text"))))).head())
    t("q44 full")(graft.SparkEntry.queries("q44_lang_id")(spark, d).count())
    t("q44 again")(graft.SparkEntry.queries("q44_lang_id")(spark, d).count())

    // q53 phases
    val q53 = graft.SparkEntry.queries("q53_minhash_lsh_pairs")
    t("q53 full")(q53(spark, d).count())
    t("q53 again")(q53(spark, d).count())

    // q65 phases
    val emb = Tables(spark, d, "embeddings")
    t("ivf init sample")(emb.select(col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(42L))).limit(8).collect())
    t("ivf one agg")(emb.groupBy((pmod(col("vec_id"), lit(8))).as("cell"))
      .agg(count(lit(1)).as("n"),
        (0 until 64).map(i => sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s_$i")): _*)
      .collect())
    t("ivf build")(graft.sim.IvfIndex.build(
      emb, "vec_id", "embedding", nlist = 8).cells.count())
    t("ivf build2")(graft.sim.IvfIndex.build(
      emb, "vec_id", "embedding", nlist = 8).cells.count())
    val q65 = graft.SparkEntry.queries("q65_ann_ivf_topk")
    t("q65 full")(q65(spark, d).count())
    t("q65 again")(q65(spark, d).count())
    spark.stop()
  }
}
