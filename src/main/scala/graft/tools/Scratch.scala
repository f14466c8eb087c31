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

    // plain (no checkpoint) simHashNearDups clone, to test exchange reuse
    val fps = graft.dedup.Dedup.simHashTable(docs, "text", "doc_id")
    val blocked = fps.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 15).bitwiseAND(0x7FFFL)): _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_key")
    val a = blocked.select(col("block_idx"), col("block_key"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = blocked.select(col("block_idx"), col("block_key"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val pairs = a.join(b, Seq("block_idx", "block_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        graft.dedup.Dedup.hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= 2)
    t("warm")(docs.select(xxhash64(col("text"))).count())
    t("plain nearDups")(pairs.write.format("noop").mode("overwrite").save())
    t("plain again")(pairs.write.format("noop").mode("overwrite").save())
    val plan = pairs.queryExecution.executedPlan.toString
    for (m <- Seq("ReusedExchange", "ReusedQueryStage", "ObjectHashAggregate", "HashAggregate"))
      println(s"$m=" + m.r.findAllIn(plan).length)
    t("checkpointed nearDups")(
      graft.dedup.Dedup.simHashNearDups(docs, "text", "doc_id", 2)
        .write.format("noop").mode("overwrite").save())
  }
}
