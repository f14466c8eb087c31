package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact-to-fact join is the shuffle of
  * both sides. Writing both tables bucketed by the join key (same bucket
  * count) lets Spark plan a SortMergeJoin with NO Exchange on either
  * side — the join runs bucket-to-bucket. This is the persistent
  * counterpart of `repartition()` pre-partitioning: pay the shuffle once
  * at write time, reuse it on every subsequent join/aggregate.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String,
      numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketKey)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True when a physical plan contains no SHUFFLE exchange — the
    * property bucketed joins exist to achieve. (BroadcastExchange is not
    * a shuffle; the planner may still prefer broadcast for tiny sides.) */
  def isShuffleFree(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    !p.contains("Exchange hashpartitioning") && !p.contains("ShuffleExchange")
  }

  /** Join two same-bucketed tables on the bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
