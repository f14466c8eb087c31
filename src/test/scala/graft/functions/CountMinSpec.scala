package graft.functions

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Count-Min sketch invariants: never undercounts, exact when the
  * matrix is collision-free, partition-layout-invariant (the map-side
  * combine is a true monoid), and the codegen'd probe equals the
  * interpreted row math. */
class CountMinSpec extends SparkSpec {
  import SketchFunctions._

  private val depth = 4
  private val width = 64

  private lazy val toks = {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("tok"), TextAnalysis.h60(col("tok")).as("h"))
  }

  test("estimates never undercount the true frequency") {
    val sketch = toks.agg(count_min_agg(col("h"), depth, width).as("sketch"))
    val rows = toks.groupBy("tok", "h").agg(count(lit(1)).as("true_n"))
      .crossJoin(broadcast(sketch))
      .select(col("true_n"),
        cms_estimate_long(col("sketch"), col("h"), depth, width).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), s"undercount: $r")
    }
  }

  test("exact when width is collision-free for the key set") {
    // few distinct keys + wide matrix → no collisions → est == true count
    val few = toks.filter(length(col("tok")) === 3)
    assert(few.select("h").distinct().count() < 200)
    val wide = 1 << 16
    val sketch = few.agg(count_min_agg(col("h"), depth, wide).as("sketch"))
    val bad = few.groupBy("h").agg(count(lit(1)).as("true_n"))
      .crossJoin(broadcast(sketch))
      .filter(cms_estimate_long(col("sketch"), col("h"), depth, wide) =!= col("true_n"))
      .count()
    assert(bad == 0)
  }

  test("sketch is invariant to partition layout (merge is a monoid)") {
    def mat(parts: Int): Seq[Long] = {
      val t = if (parts == 1) toks.coalesce(1) else toks.repartition(parts, col("h"))
      t.agg(count_min_agg(col("h"), depth, width).as("sketch"))
        .collect()(0).getSeq[Long](0)
    }
    assert(mat(1) == mat(7))
  }

  test("SQL registry: count_min_agg + cms_estimate match the Column API") {
    GraftExtensions.register(spark)
    toks.createOrReplaceTempView("cms_toks")
    val viaSql = spark.sql(
      """WITH sk AS (SELECT count_min_agg(h, 4, 64) AS s FROM cms_toks),
        |d AS (SELECT DISTINCT h FROM cms_toks)
        |SELECT d.h, cms_estimate(sk.s, d.h, 4, 64) AS est
        |FROM d CROSS JOIN sk""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = toks.select("h").distinct()
      .crossJoin(broadcast(toks.agg(count_min_agg(col("h"), depth, width).as("s"))))
      .select(col("h"), cms_estimate_long(col("s"), col("h"), depth, width).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("probe matches the per-row affine bucket math") {
    val params = MinHashAgg.affineParams(depth)
    val sketchRow = toks.agg(count_min_agg(col("h"), depth, width).as("sketch"))
      .collect()(0).getSeq[Long](0)
    val probes = toks.select("h").distinct().limit(50).collect().map(_.getLong(0))
    val est = toks.sparkSession.createDataFrame(
        probes.toSeq.map(Tuple1(_))).toDF("h")
      .crossJoin(broadcast(
        toks.agg(count_min_agg(col("h"), depth, width).as("sketch"))))
      .select(col("h"),
        cms_estimate_long(col("sketch"), col("h"), depth, width).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { h =>
      val expect = params.indices.map { i =>
        val (a, b) = params(i)
        sketchRow(i * width + (MinHashAgg.affinePerm(a, b, h) % width).toInt)
      }.min
      assert(est(h) == expect, s"h=$h")
    }
  }
}
