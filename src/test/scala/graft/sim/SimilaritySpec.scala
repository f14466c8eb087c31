package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Direct operator-contract tests for [[Similarity]] — the query surface
  * is oracle-checked (q61/q66/q142 …); these pin the documented edge
  * semantics the sf data never exercises. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // one query vector, `nDups` exact copies (cos 1 → masked near-dups),
  // five genuine hard negatives at cos 0.8
  private def corpus(nDups: Int) = {
    val q = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val neg = Seq(0.8f, 0.6f, 0.0f, 0.0f)
    ((0L, q) +: (1 to nDups).map(i => (i.toLong, q)) :+
      (11L, neg) :+ (12L, neg) :+ (13L, neg) :+ (14L, neg) :+ (15L, neg))
      .toDF("vec_id", "embedding")
  }

  test("zero-norm vectors score cosine 0, never NaN — and never top a ranking") {
    // a zero embedding (failed embedding job) used to yield 0/0 = NaN,
    // which Spark's nan-safe ordering ranks ABOVE every real number and
    // which passes every `cos >= t` filter
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
        df.filter(col("vec_id") === 0), df, "vec_id", "embedding", 1)
      .head()
    assert(top.getLong(2) == 1L, "the real neighbor must outrank the zero vector")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      dim = 2, threshold = 0.5).collect()
    assert(pairs.forall(r => !r.getDouble(2).isNaN))
    assert(!pairs.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L))
  }

  test("bandedCosineNearDupPairs: superset of band 0, subset of exact, no pair dupes") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairSet(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", dim = 64, threshold = 0.2, bits = 3))
    val bandedRows = Similarity.bandedCosineNearDupPairs(
      emb, "vec_id", "embedding", dim = 64, threshold = 0.2, bits = 3, bands = 2)
      .collect()
    val banded = bandedRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // band 0 IS the single-band family (plane offset 0): OR-amplification
    // can only add pairs, and the (id_a, id_b) aggregate must dedup
    // multi-band collisions down to one row per pair
    assert(single.subsetOf(banded), "band 0's pairs must survive amplification")
    assert(banded.size > single.size, "band 1 should recover cross-bucket pairs")
    assert(bandedRows.length == banded.size, "one output row per pair")
    // still a subset of the exact answer: banding changes recall, never adds
    // below-threshold pairs
    val exact = pairSet(emb.as("a").join(emb.as("b"),
      col("a.vec_id") < col("b.vec_id") &&
        Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.2)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")))
    assert(banded.subsetOf(exact))
  }

  test("filteredTopK: pre-filter semantics — k survivors, all passing; filter pushed to scan") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val res = Similarity.filteredTopK(emb.filter(col("vec_id") < 4), emb,
      "vec_id", "embedding", k = 3, candidateFilter = col("label") === 2)
    val rows = res.collect()
    // pre-filtering always yields exactly k per query when the filtered
    // corpus has that many candidates (post-filtering a plain top-k would
    // under-return here: at ~10% selectivity most unfiltered top-3 sets
    // contain no label-2 member at all)
    assert(rows.length == 4 * 3)
    val lbl = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => lbl(r.getLong(2)) == 2))
    // the metadata predicate reaches the parquet scan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*label[^\\]]*\\].*"), plan)
  }

  test("suggestedLshBits holds bucket size constant as the corpus grows") {
    assert(Similarity.suggestedLshBits(2000) == 1)      // tiny corpus → min
    assert(Similarity.suggestedLshBits(1024 * 16) == 4)
    // 10× the corpus → +log2(10) ≈ +3.3 → +4 bits, same bucket size
    assert(Similarity.suggestedLshBits(1024L * 16 * 10) == 8)
    assert(Similarity.suggestedLshBits(Long.MaxValue) == 24) // clamped
    // empty corpus sizes like corpus 1 (any geometry gives the empty
    // pair set; a query over an empty table must not throw)
    assert(Similarity.suggestedLshBits(0) == 1)
    intercept[IllegalArgumentException](Similarity.suggestedLshBits(-1))
    intercept[IllegalArgumentException](Similarity.suggestedLshBits(100, 0))
  }

  test("lshTopKTables: L=1 == lshTopK exactly; more tables never lose recall; no pair dupes") {
    val emb = graft.sources.Tables(spark, sf("sf0.01"), "embeddings")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // table 0 IS the single-table hyperplane family (band offset 0)
    val one = key(Similarity.lshTopKTables(queries, emb, "vec_id", "embedding",
      k = 3, dim = 64, bits = 4, tables = 1))
    val single = key(Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      k = 3, dim = 64, bits = 4))
    assert(one == single)
    // recall is monotone in L: candidate pools are nested by construction
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(tables: Int): Double = {
      val got = Similarity.lshTopKTables(queries, emb, "vec_id", "embedding",
        k = 3, dim = 64, bits = 4, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val r1 = recall(1); val r3 = recall(3)
    assert(r3 >= r1, s"L=3 recall $r3 < L=1 recall $r1")
    assert(r3 > 0.5, s"L=3 recall $r3") // measured 0.96 at sf0.01
    // candidates surfacing in several tables dedup to ONE ranked row
    val rows = Similarity.lshTopKTables(queries, emb, "vec_id", "embedding",
      k = 3, dim = 64, bits = 4, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == rows.distinct.length)
    intercept[IllegalArgumentException](Similarity.lshTopKTables(
      queries, emb, "vec_id", "embedding", 3, 64, 4, tables = 0))
  }

  test("hardNegatives: masked rows promote the next candidate, not shorten the list") {
    val c = corpus(nDups = 6)
    val got = Similarity.hardNegatives(
        c.filter(col("vec_id") === 0), c, "vec_id", "embedding",
        k = 3, dupThreshold = 0.9, dim = 4, bits = 2, overFetch = 8)
      .orderBy("rnk").collect()
    // the 6 masked copies are skipped; ranks 1..3 are the true negatives
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("hardNegatives: >overFetch masked near-dups under-return (documented best-effort)") {
    val c = corpus(nDups = 6)
    // overFetch=2 → fetch top-5; all 5 fetched are masked copies → the
    // query returns ZERO rows. This is the contract's documented failure
    // mode — never wrong rows, possibly fewer.
    val starved = Similarity.hardNegatives(
        c.filter(col("vec_id") === 0), c, "vec_id", "embedding",
        k = 3, dupThreshold = 0.9, dim = 4, bits = 2, overFetch = 2)
      .collect()
    assert(starved.isEmpty)
    // sizing overFetch at the duplicate multiplicity restores the full k
    val healed = Similarity.hardNegatives(
        c.filter(col("vec_id") === 0), c, "vec_id", "embedding",
        k = 3, dupThreshold = 0.9, dim = 4, bits = 2, overFetch = 6)
      .collect()
    assert(healed.length == 3)
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(c, c, "vec_id", "embedding",
        k = 3, dupThreshold = 0.9, dim = 4, overFetch = -1)
    }
  }

  test("recallAtK: hit fraction per query, denominator is the EXACT side's count") {
    import spark.implicits._
    def ranking(rows: (Long, Long)*) =
      rows.toDF("query_id", "neighbor_id")
    // q1: perfect overlap; q2: 1 of 3; q3: exact side has only TWO
    // eligible neighbors (corpus smaller than k) and approx found both —
    // recall must read 1.0, not 2/3; q4: approx found nothing
    val exact = ranking((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 20L), (3L, 21L),
      (4L, 30L), (4L, 31L), (4L, 32L))
    val approx = ranking((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 99L), (2L, 98L),
      (3L, 20L), (3L, 21L), (3L, 22L),
      (4L, 90L), (4L, 91L), (4L, 92L))
    val got = Similarity.recallAtK(approx, exact)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 2L, 2L, 1.0),
      (4L, 3L, 0L, 0.0)))
  }

  test("recallAtK: duplicate approx rows (at-least-once streams) cannot inflate recall") {
    import spark.implicits._
    // the streaming near-dup paths document at-least-once duplicate
    // emission; feeding such a ranking must give the same recall as its
    // deduplicated form — before the r12 distinct, each duplicate
    // multiplied BOTH counters and recall could exceed 1.0
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("query_id", "neighbor_id")
    val approxDup = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 99L),
      (2L, 50L), (2L, 50L)).toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(approxDup, exact).orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 0L, 0.0)))
    // a query with zero exact rows emits NO row (undefined recall, not
    // a silent 1.0) — the documented deliberate edge
    val exactEmpty = Seq((1L, 10L)).toDF("query_id", "neighbor_id")
    val approxQ2 = Seq((2L, 10L)).toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(approxQ2, exactEmpty)
      .select("query_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("lshRecallCurve: each prefix slice == the standalone lshTopKTables recall; monotone; partial rule") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val emb = graft.sources.Tables(spark, sf("sf0.01"), "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val curve = Similarity.lshRecallCurve(queries, emb, "vec_id", "embedding",
        k = 3, dim = 64, bits = 4, maxTables = 3)
      .orderBy("tables").collect()
      .map(r => (r.getAs[Int]("tables"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))
    assert(curve.map(_._1).toSeq == Seq(1, 2, 3))
    // the slicing identity: step L's pooled recall equals running the
    // standalone L-table operator through the same metric
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
    curve.foreach { case (nt, nHit, _) =>
      val standalone = Similarity.recallAtK(
        Similarity.lshTopKTables(queries, emb, "vec_id", "embedding",
          k = 3, dim = 64, bits = 4, tables = nt),
        exact).agg(fsum("n_hit")).head().getLong(0)
      assert(standalone == nHit, s"tables=$nt: curve $nHit != standalone $standalone")
    }
    // candidate sets are nested, so recall never decreases with L
    assert(curve.sliding(2).forall { case Array((_, _, a), (_, _, b)) => b >= a })
    // the partial rule: an unreachable target reports None (never a
    // silent best-miss), a trivial one reports the min step
    assert(Similarity.suggestedLshTables(queries, emb, "vec_id", "embedding",
      k = 3, dim = 64, bits = 4, maxTables = 3, targetRecall = 1.0).isEmpty ||
      curve.last._3 == 1.0)
    val trivial = Similarity.suggestedLshTables(queries, emb, "vec_id",
      "embedding", k = 3, dim = 64, bits = 4, maxTables = 3,
      targetRecall = math.max(curve.head._3, 1e-9))
    assert(trivial.contains(1))
  }

  test("recall curves release their exact-set checkpoint blocks (no orphan accumulation)") {
    val emb = graft.sources.Tables(spark, sf("sf0.01"), "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
    // warm once — first call may register session-lifetime state
    Similarity.lshRecallCurve(queries, emb, "vec_id", "embedding",
      k = 2, dim = 64, bits = 4, maxTables = 2)
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      Similarity.lshRecallCurve(queries, emb, "vec_id", "embedding",
        k = 2, dim = 64, bits = 4, maxTables = 2)
      val model = IvfIndex.build(emb, "vec_id", "embedding", nlist = 4,
        maxIter = 0)
      Similarity.ivfRecallCurve(model, queries, emb, "vec_id", "embedding",
        k = 2, ladder = Similarity.nprobeLadder(4))
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"repeated calibrations accumulated ${after - before} persistent RDDs " +
        "(exact-set checkpoint leaves not released)")
  }

  test("nprobeLadder: doubling steps ending exactly at nlist") {
    assert(Similarity.nprobeLadder(1) == Seq(1))
    assert(Similarity.nprobeLadder(2) == Seq(1, 2))
    assert(Similarity.nprobeLadder(8) == Seq(1, 2, 4, 8))
    // non-power-of-two nlist: last step is nlist itself, not a power
    assert(Similarity.nprobeLadder(6) == Seq(1, 2, 4, 6))
    assert(Similarity.nprobeLadder(1000).last == 1000)
    intercept[IllegalArgumentException](Similarity.nprobeLadder(0))
  }

  test("ivfRecallCurve/suggestedNprobe: last step is exact (recall 1.0), choice monotone in target") {
    val emb = graft.sources.Tables(spark, sf("sf0.01"), "embeddings")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val model = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val curve = Similarity.ivfRecallCurve(model, queries, emb, "vec_id",
        "embedding", k = 3, ladder = Similarity.nprobeLadder(8))
      .orderBy("nprobe").collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Double]("recall")))
    assert(curve.map(_._1).toSeq == Seq(1, 2, 4, 8))
    // the totality invariant: probing every cell IS brute force
    assert(curve.last._2 == 1.0)
    // recall never decreases as nprobe grows (probe sets are nested)
    assert(curve.sliding(2).forall { case Array((_, a), (_, b)) => b >= a })
    // suggestedNprobe picks the min qualifying step, monotone in target
    val loose = Similarity.suggestedNprobe(model, queries, emb, "vec_id",
      "embedding", k = 3, targetRecall = 0.1)
    val strict = Similarity.suggestedNprobe(model, queries, emb, "vec_id",
      "embedding", k = 3, targetRecall = 1.0)
    assert(loose <= strict && strict <= 8)
    intercept[IllegalArgumentException](Similarity.suggestedNprobe(
      model, queries, emb, "vec_id", "embedding", k = 3, targetRecall = 1.5))
  }
}
