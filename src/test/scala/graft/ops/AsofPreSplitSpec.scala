package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-key pre-split for the as-of join (Skew.asofPreSplit): identical
  * output to the unsplit native operator, with the hot key actually
  * spread across multiple shuffle partitions. */
class AsofPreSplitSpec extends SparkSpec {
  import spark.implicits._

  // one pathologically hot key ("hot": 4000 left rows, 2000 right rows
  // over t=0..40000) + normal keys + a key with no right rows + left
  // rows before any right row (null matches) + time gaps (empty buckets)
  private lazy val leftDf = (
    (0 until 4000).map(i => ("hot", i.toLong * 10, s"L$i")) ++
    (0 until 50).map(i => ("cold", 20000L + i * 7, s"C$i")) ++
    (0 until 50).map(i => ("orphan", i.toLong * 100, s"O$i"))
  ).toDF("k", "t", "lv")

  private lazy val rightDf = (
    (0 until 2000).map(i => ("hot", i.toLong * 20 + 1, s"R$i")) ++
    // cold side clustered early, leaving later buckets empty (carry path)
    (0 until 5).map(i => ("cold", 100L + i, s"CR$i"))
  ).toDF("k", "t", "rv")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "t", "lv", "rv").orderBy("k", "t", "lv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq

  test("pre-split output == unsplit native as-of output (strict and <=)") {
    for (strict <- Seq(true, false)) {
      val plain = Extended.asofJoinNative(leftDf, rightDf, Seq("k"), "t", strict)
      val split = Skew.asofPreSplit(leftDf, rightDf, Seq("k"), "t",
        bucketWidth = 5000L, strict = strict)
      assert(canon(split) == canon(plain), s"strict=$strict")
    }
  }

  test("carry rows cross empty buckets: cold key matches from bucket 0") {
    val split = Skew.asofPreSplit(leftDf, rightDf, Seq("k"), "t", 1000L)
    // all cold left rows are at t>=20000, every bucket since t=105 is
    // empty on the right — each must still see the latest early row CR4
    val cold = split.filter($"k" === "cold").select("rv").distinct().collect()
    assert(cold.map(_.getString(0)).toSeq == Seq("CR4"))
    // orphan key (no right rows at all) survives with null payload
    assert(split.filter($"k" === "orphan" && $"rv".isNotNull).isEmpty)
  }

  test("many fine buckets: no row explosion, carry subplan is a window not a join") {
    // bucketWidth=10 over t=0..40000 → ~4000 buckets for the hot key;
    // the old carry shape (key-equal join with a bucket< residual)
    // materialized O(B_left × B_right) ≈ 8M pairs per key here before
    // re-aggregating — the window form touches each compacted bucket row
    // once
    val split = Skew.asofPreSplit(leftDf, rightDf, Seq("k"), "t",
      bucketWidth = 10L)
    val plain = Extended.asofJoinNative(leftDf, rightDf, Seq("k"), "t")
    assert(canon(split) == canon(plain))
    // plan shape: the only join in the whole pre-split plan is the
    // native as-of operator — the carry path must contribute a Window,
    // never a SortMergeJoin/ShuffledHashJoin/BroadcastNestedLoop (the
    // quadratic range-join shape)
    val planStr = split.queryExecution.executedPlan.toString
    for (bad <- Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!planStr.contains(bad), s"carry plan regressed to $bad")
    assert(planStr.contains("Window"), "expected the running-last carry window")
  }

  test("hot key spreads across shuffle partitions; unsplit concentrates it") {
    // AQE coalesces this tiny fixture to one partition, which would mask
    // the placement difference under test
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try spreadAssertions()
    finally spark.conf.set(key, prev)
  }

  test("suggestedAsofBucketWidth: hottest key is sized to the target") {
    // hot: 2000 right rows over t=1..39981 (range 39981); target 500
    // → ceil(2000/500)=4 buckets → width = range/4 = 9995
    val w = Skew.suggestedAsofBucketWidth(rightDf, Seq("k"), "t",
      targetRowsPerBucket = 500L)
    assert(w == 9995L)
    // the sized split really does bound the hottest key's per-bucket
    // population near the target (uniform-in-time rows)
    val perBucket = rightDf
      .withColumn("b", floor($"t" / w))
      .groupBy("k", "b").count()
      .agg(max("count")).head().getLong(0)
    assert(perBucket <= 520L, s"hottest bucket $perBucket > target+4%")
    // a corpus whose hottest key fits the target entirely → one bucket
    // spanning the whole range (no pointless carry machinery)
    val wide = Skew.suggestedAsofBucketWidth(rightDf, Seq("k"), "t",
      targetRowsPerBucket = 1000000L)
    assert(wide >= 39981L)
    // empty right side → effectively unbucketed
    assert(Skew.suggestedAsofBucketWidth(
      rightDf.filter($"k" === "nope"), Seq("k"), "t") == Long.MaxValue)
  }

  test("suggestedShufflePartitions: cores floor locally, volume ceiling at cluster scale") {
    // the r11 sf10 measurement encoded: 60M-row fact × 128 B ≈ 7.7 GB
    // sits under the 32-core × 1 GiB budget → the rule reproduces the
    // hand-tuned 32 (which beat 96 and 256 in the recorded sweep); the
    // r15 bytes FLOOR doesn't bite (7.7 GB / 8 MiB ≈ 920 ≥ 32 cores)
    assert(Skew.suggestedShufflePartitions(60_000_000L, 128L, 32) == 32)
    // sf0.1-sized shuffle (600k × 128 B ≈ 77 MB): the r15 bytes floor
    // caps partitions at ceil(77 MB / 8 MiB) = 10 — the r14 driver's
    // 8-core run beat 32 cores 1.6–1.8× on q36/q167/q170/q171 purely
    // because 32 partitions over-split shuffles this small
    assert(Skew.suggestedShufflePartitions(600_000L, 128L, 32) == 10)
    // ...and never splits below the core count when the data fills it
    assert(Skew.suggestedShufflePartitions(600_000L, 128L, 8) == 8)
    // zero rows = unknown/empty input: fall back to cores, never 1
    assert(Skew.suggestedShufflePartitions(0L, 128L, 4) == 4)
    // cluster regime: 100 TB at 128 B/row → volume dominates ANY core
    // count (the extrapolation the r11 recording documented)
    val cluster = Skew.suggestedShufflePartitions(
      100L * (1L << 40) / 128L, 128L, 32000)
    assert(cluster == 102400) // 100 TiB / 1 GiB
    // boundary: one byte past the core budget adds a partition
    val coreBudget = 32L << 30
    assert(Skew.suggestedShufflePartitions(coreBudget / 128L, 128L, 32) == 32)
    assert(Skew.suggestedShufflePartitions(coreBudget / 128L + 1L, 128L, 32) == 33)
    // saturation, not overflow, on absurd inputs
    assert(Skew.suggestedShufflePartitions(Long.MaxValue, 1024L, 8) == Int.MaxValue)
    intercept[IllegalArgumentException](
      Skew.suggestedShufflePartitions(-1L, 128L, 32))
  }

  test("pre-split at the suggested width == unsplit native output") {
    val w = Skew.suggestedAsofBucketWidth(rightDf, Seq("k"), "t",
      targetRowsPerBucket = 500L)
    val split = Skew.asofPreSplit(leftDf, rightDf, Seq("k"), "t", w)
    val plain = Extended.asofJoinNative(leftDf, rightDf, Seq("k"), "t")
    assert(canon(split) == canon(plain))
  }

  private def spreadAssertions(): Unit = {
    def spread(df: org.apache.spark.sql.DataFrame): Long =
      df.filter($"k" === "hot")
        .withColumn("p", spark_partition_id())
        .select("p").distinct().count()
    val unsplitSpread = spread(
      Extended.asofJoinNative(leftDf, rightDf, Seq("k"), "t"))
    val splitSpread = spread(
      Skew.asofPreSplit(leftDf, rightDf, Seq("k"), "t", 5000L))
    assert(unsplitSpread == 1L) // keyed merge: whole key on one partition
    assert(splitSpread > 1L)    // 8 buckets → multiple composite keys
  }
}
