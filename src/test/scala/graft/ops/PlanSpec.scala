package graft.ops

import graft.SparkSpec

/** Plan-shape regression tests: the optimizations that make these
  * operators survive a 100× scale-up must be visible in the physical
  * plan, not assumed. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("q03: filters are pushed into the parquet scan") {
    val p = plan("q03_filter_pushdown")
    // (the plan string elides long filter lists — assert on the visible prefix)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q02: column pruning reaches the scan (4 of 11 lineitem columns)") {
    val p = plan("q02_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>"), p)
  }

  test("q07: small dimension join is a broadcast hash join") {
    val p = plan("q07_broadcast_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q08: star join broadcasts every dimension (no sort-merge joins)") {
    val p = plan("q08_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q04: aggregation is partial (map-side combine) then final") {
    val p = plan("q04_agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q09: semi join planned as a join, not a subquery re-scan") {
    val p = plan("q09_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("q18: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q18_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: scan reads only the 4 needed lineitem columns") {
    val p = plan("q05_filter_agg_revenue")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("q61: brute-force top-k broadcasts the query set, streams the corpus") {
    val p = plan("q61_cosine_topk_brute")
    // the small query side is broadcast; the corpus is never shuffled
    // before the per-query top-k aggregation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("minhash signatures: ONE shuffle total (window partitioning reused by agg)") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val p = graft.dedup.Dedup.minHashSignatures(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected 1 shuffle, plan had $shuffles:\n$p")
  }

  test("chunkDocuments: pure map stage, zero shuffles") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val p = graft.text.TextAnalysis.chunkDocuments(docs, "doc_id", "text", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("quantizeEmbeddings: pure map stage, zero shuffles") {
    val emb = graft.sources.Tables(spark, sf(), "embeddings")
    val p = graft.sim.Similarity.quantizeEmbeddings(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("q113: binned interval join plans as an equi join, never a nested loop") {
    val p = plan("q113_interval_bin_join")
    // the naive keyless BETWEEN form is a BroadcastNestedLoopJoin —
    // O(n·m) compares; the whole point of binning is to make it an
    // equi join (hash or sort-merge on _bin)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q116: the per-language threshold table joins as a broadcast") {
    val p = plan("q116_quality_percentile_gate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q110: the 64-row dimension-stats table joins as a broadcast") {
    val p = plan("q110_standardize_embeddings")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dupSentenceStats: pure map stage, zero shuffles") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val p = graft.text.TextAnalysis.dupSentenceStats(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("heavyHitters: the sketch rides a broadcast, the probe never shuffles tokens") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val p = graft.text.TextAnalysis.heavyHitters(docs, "text", 50L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    // shuffles: the global sketch aggregation (to one row) + the probe
    // distinct — and nothing else (no token-frequency groupBy join)
    val shuffles = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).length
    assert(shuffles <= 2, s"expected <= 2 shuffles:\n$p")
  }

  test("bloomSemiJoin: the bloom probe sits on the scan, before any shuffle") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val large = docs.select(col("doc_id"),
      graft.text.TextAnalysis.h60(col("text")).as("k"))
    val keys = docs.filter(col("doc_id") % 5 === 0)
      .select(graft.text.TextAnalysis.h60(col("text")).as("kk"))
    val p = Extended.bloomSemiJoin(large, "k", keys, "kk", 1000L)
      .queryExecution.executedPlan.toString
    val i = p.indexOf("bloom_might_contain_long")
    assert(i >= 0, p)
    // the probe's subtree down to its parquet scan must contain no
    // Exchange — pruning happens BEFORE the large side's shuffle
    val rest = p.substring(i)
    val scanIdx = rest.indexOf("Scan parquet")
    assert(scanIdx >= 0, p)
    assert(!rest.substring(0, scanIdx).contains("Exchange"),
      "bloom probe must sit directly on the scan:\n" + p)
  }
}
