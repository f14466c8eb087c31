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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val docs = Tables(spark, d, "documents")
    t("warmup scan")(docs.select(xxhash64(col("text"))).count())

    val lexicon = broadcast(
      graft.text.TextAnalysis.stopwords.toSeq
        .flatMap { case (l, ws) => ws.map(w => (l, w)) }.toDF("lang_cand", "tok"))
    val exploded = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    t("explode only")(exploded.count())
    val joined = exploded.join(lexicon, Seq("tok"))
    t("explode+join")(joined.count())
    val perLang = joined.groupBy(col("doc_id"), col("lang_cand"))
      .agg(countDistinct(col("tok")).as("score"))
    t("+countDistinct")(perLang.count())
    val best = perLang.groupBy(col("doc_id"))
      .agg(max(struct(col("score"), col("lang_cand"))).as("best"))
    t("+argmax")(best.count())
    t("full q44")(graft.SparkEntry.queries("q44_lang_id")(spark, d).count())
    t("full q44 again")(graft.SparkEntry.queries("q44_lang_id")(spark, d).count())

    val sigs = graft.dedup.Dedup.minHashSignatures(docs, "text", "doc_id")
    t("minhash sigs")(sigs.count())
    t("minhash sigs again")(sigs.count())
    val sigsP = sigs.persist()
    sigsP.count()
    val pairs = graft.dedup.Dedup.lshCandidatePairs(sigsP, "doc_id")
    t("lsh pairs (sigs cached)")(pairs.count())
    t("lsh pairs again")(pairs.count())
    sigsP.unpersist()
    t("full q53")(graft.SparkEntry.queries("q53_minhash_lsh_pairs")(spark, d).count())
    t("full q53 again")(graft.SparkEntry.queries("q53_minhash_lsh_pairs")(spark, d).count())
    spark.stop()
  }
}
