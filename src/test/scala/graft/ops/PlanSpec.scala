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
