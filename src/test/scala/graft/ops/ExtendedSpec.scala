package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoinBinned == naive theta join, each pair exactly once") {
    // crafted axis: intervals spanning 1..4 bins (width 10), points on
    // bin and interval boundaries (inclusive both ends), empty overlap
    val points = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 19L), (5L, 20L),
      (6L, 35L), (7L, 49L), (8L, 50L), (9L, 99L)).toDF("pid", "t")
    val ivs = Seq((100L, 0L, 5L), (101L, 5L, 35L), (102L, 19L, 20L),
      (103L, 60L, 95L), (104L, 36L, 36L)).toDF("iv", "s", "e")
    val got = Extended.intervalJoinBinned(points, "t", ivs, "s", "e", 10L)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = points.collect().flatMap { p =>
      ivs.collect().collect {
        case r if p.getLong(1) >= r.getLong(1) && p.getLong(1) <= r.getLong(2) =>
          (p.getLong(0), r.getLong(0))
      }
    }
    assert(got.sorted.toSeq == want.sorted.toSeq)  // no misses, NO duplicates
    assert(got.length == got.distinct.length)
  }

  test("groupedQuantiles: singleton and exact-rank groups return the value, not null") {
    // group a: n=1 (pos=0, rank ⌊pos⌋+2 absent — the null trap);
    // group b: n=3 with q=0.5 landing exactly on rank 2 (frac=0);
    // group c: n=2 with a genuinely interpolated midpoint
    val df = Seq(("a", 7.0), ("b", 1.0), ("b", 2.0), ("b", 3.0),
      ("c", 10.0), ("c", 20.0)).toDF("g", "v")
    val got = Extended.groupedQuantiles(df, "g", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got("a") == ((7.0, 7.0)))       // single value, never null
    assert(got("b") == ((2.0, 2.8)))       // exact rank; 0.9·2=1.8 → 2+0.8·1
    assert(got("c") == ((15.0, 19.0)))     // midpoint; 10+0.9·10
  }

  test("groupedQuantiles: multi-column melt ranks every column in one pass, nulls excluded") {
    val df = Seq(
      ("a", Some(1.0), Some(10.0)), ("a", Some(2.0), Some(20.0)),
      ("a", Some(3.0), None),        // null y excluded from y's ranking only
      ("b", Some(5.0), Some(50.0))).toDF("g", "x", "y")
    val got = Extended.groupedQuantiles(df, "g", Seq(
        "x" -> Seq("x50" -> 0.5, "x100" -> 1.0),
        "y" -> Seq("y50" -> 0.5)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // x over {1,2,3}: p50=2, p100=3; y over {10,20} (null dropped): p50=15
    assert(got("a") == ((2.0, 3.0, 15.0)))
    assert(got("b") == ((5.0, 5.0, 50.0)))
    intercept[IllegalArgumentException] {
      Extended.groupedQuantiles(df, "g", Seq.empty)
    }
    // duplicate output names would silently cross-wire the specs
    intercept[IllegalArgumentException] {
      Extended.groupedQuantiles(df, "g", Seq(
        "x" -> Seq("p50" -> 0.5), "y" -> Seq("p50" -> 0.5)))
    }
    intercept[IllegalArgumentException] {
      Extended.groupedQuantiles(df, "g", "x", Seq("bad" -> 1.5))
    }
  }

  test("groupedQuantiles: an all-null group yields NULL quantiles, not a dropped row") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None: Option[Double]), ("b", None: Option[Double])).toDF("g", "v")
    val rows = Extended.groupedQuantiles(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    assert(rows.length == 2)                  // group b still present
    assert(rows(0).getDouble(1) == 2.0)
    assert(rows(1).isNullAt(1))               // NULL, as quantile_cont gives
  }

  test("asofJoin: whole-row payload semantics — a null field in the match stays null") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    // latest match at t=5 has a NULL in column a; per-column fill would
    // stitch a=5 from the older t=0 row — a row that never existed
    val right = Seq((1L, 0L, Some(5L), Some(7L)), (1L, 5L, None, Some(10L)))
      .toDF("k", "t", "a", "b")
    val r = Extended.asofJoin(left, right, Seq("k"), "t", Seq("a", "b")).head()
    assert(r.isNullAt(2) && r.getLong(3) == 10L)
  }

  test("asofJoin: right rows tied on (key, ts) resolve deterministically (max payload)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some(1L), Some(1L)), (1L, 5L, Some(2L), Some(2L)))
      .toDF("k", "t", "a", "b")
    (1 to 3).foreach { _ =>
      val r = Extended.asofJoin(left, right.repartition(7), Seq("k"), "t",
        Seq("a", "b")).head()
      assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    }
  }

  test("groupedQuantiles: duplicate runs rank correctly through the compressed form") {
    // [1,1,1,2]: the compressed row for v=1 occupies ranks 1..3 — both
    // flanks of p50 (ranks 2,3) land INSIDE that run, and p75's flanks
    // (3,4) straddle the run boundary
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 2.0)).toDF("g", "v")
    val got = Extended.groupedQuantiles(df, "g", "v",
        Seq("p50" -> 0.5, "p75" -> 0.75))
      .head()
    assert(got.getDouble(1) == 1.0)   // both flanks in the v=1 run
    assert(got.getDouble(2) == 1.25)  // 1 + (2-1)·0.25 across the boundary
  }

  test("intervalJoinBinned: oversized span fails fast, not OOM") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((100L, 0L, Long.MaxValue - 1)).toDF("iv", "s", "e") // sentinel
    val ex = intercept[Exception] {
      Extended.intervalJoinBinned(points, "t", ivs, "s", "e", 10L,
        maxSpanBins = 100).collect()
    }
    assert(ex.getMessage.contains("inverted interval or span over") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("inverted interval or span over")),
      s"got: ${ex.getMessage}")
  }

  test("intervalJoinBinned: null bounds are dropped like the theta form") {
    val points = Seq((1L, 5L), (2L, 25L)).toDF("pid", "t")
    val ivs = Seq((100L, Some(0L), Some(9L)), (101L, None, Some(9L)),
      (102L, Some(0L), None), (103L, Some(20L), Some(29L)))
      .toDF("iv", "s", "e")
    // the null-bounded 101/102 must neither match nor trip the span
    // guard's raise_error (spanOk is NULL for them)
    val got = Extended.intervalJoinBinned(points, "t", ivs, "s", "e", 10L)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((1L, 100L), (2L, 103L)))
  }

  test("systematicWeightedSample: grid decision is exact integer division") {
    // adversarial total: cum·k/total = 0.9999995 exactly — scale-6
    // HALF_UP rounding crosses to 1.000000, so floor-of-rounded-division
    // would select BOTH rows; exact integral division selects only the
    // second (true quotients 0 and 1). This is the 100 TB failure mode
    // (fractional parts within 5e-7 of 1) shrunk to two rows.
    val docs = Seq((1L, 3999998L), (2L, 2L)).toDF("doc_id", "w")
    val sel = Extended.systematicWeightedSample(docs, "doc_id", col("w"), k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sel == Seq(2L), s"got $sel")
  }

  test("bottomKSample: null keys rank last, not first") {
    // md5(NULL) = NULL and Spark ASC is NULLS FIRST by default — a null
    // key must not occupy rank 1 (the oracle's ANSI ASC is NULLS LAST)
    val docs = Seq((1L, "a", "g"), (2L, null, "g"), (3L, "b", "g"))
      .toDF("doc_id", "text", "lang")
    val top1 = Extended.bottomKSample(docs, "text", "lang", 1, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top1.length == 1 && top1.head != 2L, s"got $top1")
    val all = Extended.bottomKSample(docs, "text", "lang", 3, "doc_id")
      .orderBy("rk").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(all.last == 2L, s"null key must rank last: $all")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val nw = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val st = Extended.snapshotDiff(old, nw, "k", md5(col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("systematicWeightedSample: shard-size invariant, ~k rows selected") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    def sel(shardSize: Long): Seq[Long] =
      Extended.systematicWeightedSample(docs, "doc_id", col("n_chars"),
          k = 40, shardSize = shardSize)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val a = sel(100L)        // many shards → offsets exercised
    val b = sel(1000000L)    // one shard → plain prefix sum
    assert(a == b)           // the sharded cumsum IS the global cumsum
    // exactly k rows unless a single doc outweighs a grid step
    assert(a.length == 40, s"selected ${a.length}")
    // weighted: selected docs skew heavier than the corpus average
    val avgAll = docs.agg(avg("n_chars")).head().getDouble(0)
    val avgSel = docs.filter(col("doc_id").isin(a.map(Long.box): _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(avgSel > avgAll, s"sel=$avgSel all=$avgAll")
  }

  test("bottomKSample: exactly min(k, |group|) rows, layout-invariant") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    val k = 5
    val sizes = Extended.bottomKSample(docs, "text", "lang", k, "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val groups = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groups.foreach { case (g, n) =>
      assert(sizes(g) == math.min(k.toLong, n), s"lang=$g")
    }
    // deterministic under partition layout
    val a = Extended.bottomKSample(docs.repartition(13), "text", "lang", k, "doc_id")
      .select("lang", "rk", "doc_id").collect().map(_.toSeq).sortBy(_.toString)
    val b = Extended.bottomKSample(docs.coalesce(1), "text", "lang", k, "doc_id")
      .select("lang", "rk", "doc_id").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("gapFillForward: grid spans per key, gaps carry last value, total-order pick") {
    import java.sql.Timestamp
    val ev = Seq(
      // user 1: two events in hour 0 (later ts wins), nothing for hours
      // 1-2, one event in hour 3 → 4 grid rows
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 100L, 1.0),
      (1L, Timestamp.valueOf("2024-01-01 00:50:00"), 101L, 2.0),
      (1L, Timestamp.valueOf("2024-01-01 03:20:00"), 102L, 9.0),
      // user 2: single event → 1 grid row, no gaps
      (2L, Timestamp.valueOf("2024-01-01 05:00:00"), 103L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = graft.ops.Relational.gapFillForward(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getInt(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", 2.0, 0), // later event in the bucket wins
      (1L, "2024-01-01 01:00:00.0", 2.0, 1), // gap: carried forward
      (1L, "2024-01-01 02:00:00.0", 2.0, 1),
      (1L, "2024-01-01 03:00:00.0", 9.0, 0),
      (2L, "2024-01-01 05:00:00.0", 7.0, 0)))
  }

  test("trainingOrder: total per-shard order, layout-invariant, shards balanced") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
      .select("doc_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Extended.trainingOrder(df, "doc_id", nShards = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(docs)
    assert(got.length == 500)
    // within each shard: positions are exactly 1..n, no gaps or dupes
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.length), s"shard $sh")
      // uniform hash keeps shards near 500/8
      assert(rows.length > 30 && rows.length < 95, s"shard $sh: ${rows.length}")
    }
    // the order is a function of ids only — partition layout irrelevant
    assert(run(docs.repartition(13)) == got)
    // appending rows never reorders existing members relative to each other
    val extended = run(docs.unionAll(
      spark.range(100000, 100050).toDF("doc_id")))
    val before = got.filter(_._2 == 0).sortBy(_._3).map(_._1)
    val after = extended.filter(t => t._2 == 0 && t._1 < 100000L)
      .sortBy(_._3).map(_._1)
    assert(before == after)
  }

  test("asofJoin: strict inequality, per-key isolation, null when no match") {
    val left = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), "L1"),
      (1L, Timestamp.valueOf("2024-01-01 00:20:00"), "L2"),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00"), "L3"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), "exact-tie"), // NOT matched (strict <)
      (1L, Timestamp.valueOf("2024-01-01 00:09:00"), "r9"),
      (1L, Timestamp.valueOf("2024-01-01 00:15:00"), "r15"),
      (2L, Timestamp.valueOf("2024-01-01 00:19:00"), "other-key"))
      .toDF("k", "ts", "rv")
    val got = Extended.asofJoin(left, right, Seq("k"), "ts", Seq("rv"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(2), r.getString(3)))
    // L1@00:10 → r9 (00:09; the 00:10 tie excluded), L2@00:20 → r15,
    // L3(k=2)@00:05 → null (k=2's only right row is later)
    assert(got.toSeq == Seq(("L1", "r9"), ("L2", "r15"), ("L3", null)))
  }

  test("hashSample is deterministic and fraction-ish") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    val a = Extended.hashSample(docs, "text", 4).select("doc_id").collect().toSet
    val b = Extended.hashSample(docs, "text", 4).select("doc_id").collect().toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"frac=$frac") // 4/16 = 0.25 expected
    // monotone: a larger sample contains the smaller one
    val bigger = Extended.hashSample(docs, "text", 8).select("doc_id").collect().toSet
    assert(a.subsetOf(bigger))
  }

  test("bloomSemiJoin equals the exact semi join (false positives confirmed away)") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    val large = docs.select(col("doc_id"),
      graft.text.TextAnalysis.h60(col("text")).as("k"))
    val keys = docs.filter(col("doc_id") % 7 === 0)
      .select(graft.text.TextAnalysis.h60(col("text")).as("kk"))
    val exact = large.join(keys.select(col("kk").as("k")).distinct(),
      Seq("k"), "left_semi").select("doc_id").collect().map(_.getLong(0)).toSet
    // tiny filter + high fpp → false positives are likely, and the
    // confirming join must still remove every one of them
    val pruned = Extended.bloomSemiJoin(large, "k", keys, "kk",
      expectedItems = 100L, fpp = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pruned == exact)
    assert(exact.nonEmpty)
  }

  test("sample rate 16 keeps everything (the toHexString(16)=\"10\" trap)") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    val n = docs.count()
    assert(Extended.hashSample(docs, "text", 16).count() == n)
    // a group rated 16 keeps all its rows, exactly like an absent group
    val lang = docs.select("lang").distinct().limit(1)
      .collect().head.getString(0)
    val kept = docs.filter(
      Extended.stratifiedSample(docs, "text", "lang", Map(lang -> 16)))
    assert(kept.count() == n)
  }

  test("split covers all rows exactly once with stable assignment") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
      .withColumn("split", Extended.splitColumn(col("text")))
    assert(docs.filter(col("split").isNull).isEmpty)
    val counts = docs.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("packSequences: offsets are contiguous and bounded per shard") {
    val packed = Extended.packSequences(
      graft.sources.Tables(spark, sf("sf0.01"), "documents"),
      "doc_id", "text", maxTokens = 512, shardSize = 100L)
    val rows = packed.orderBy("doc_id").collect()
    // start offsets are the running sum of previous docs within the shard
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, shardRows) =>
      val sorted = shardRows.sortBy(_.getAs[Long]("doc_id"))
      var expected = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_offset") == expected)
        assert(r.getAs[Long]("seq_id") == expected / 512)
        assert(r.getAs[Long]("offset_in_seq") == expected % 512)
        expected += r.getAs[Long]("n_tokens")
      }
    }
    // shards pack independently: every shard restarts at offset 0
    assert(rows.filter(_.getAs[Long]("offset_in_seq") == 0L).nonEmpty)
  }
}
