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
    // same warmup as Bench
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val p = spark.read.parquet(s"$d/part.parquet")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("s")).orderBy("p_brand").count()
    spark.read.parquet(s"$d/documents.parquet").select(xxhash64(col("text"))).count()
    val docsW = spark.read.parquet(s"$d/documents.parquet").limit(256)
    graft.dedup.Dedup.simHashNearDups(docsW, "text", "doc_id")
      .write.format("noop").mode("overwrite").save()
    graft.dedup.Dedup.minHashSignatures(docsW, "text", "doc_id")
      .write.format("noop").mode("overwrite").save()

    val fn = graft.SparkEntry.queries("q101_dedup_clusters")
    val df = t("construct (eager phases)")(fn(spark, d))
    t("final write")(df.write.format("noop").mode("overwrite").save())
    val df2 = t("construct 2nd")(fn(spark, d))
    t("final write 2nd")(df2.write.format("noop").mode("overwrite").save())
  }
}
