package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The clustered-corpus generator's load-bearing properties — q174
  * pins the arithmetic cross-engine; these pin the GEOMETRY the ANN
  * ladder evidence leans on. */
class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, aniso: Boolean = false) =
    spark.range(n).select(
      col("id").as("vec_id"),
      Synthetic.clusteredEmbedding(col("id"), dim = 16, k = 8, seed = 5L,
        noiseMilli = 200, anisotropic = aniso).as("emb"),
      Synthetic.clusterCell(col("id"), k = 8, seed = 5L).as("cell"))

  test("deterministic, distinct, cell-consistent") {
    val a = corpus(500).collect().sortBy(_.getLong(0))
    val b = corpus(500).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // distinct vectors (noise hashes collide only if all dims collide)
    assert(a.map(_.getSeq[Float](1)).distinct.length == 500)
    // every cell in range and populated at n >> k
    val cells = a.map(_.getInt(2))
    assert(cells.forall(c => c >= 0 && c < 8) && cells.distinct.length == 8)
  }

  test("clustered: within-cell spread is bounded by the noise radius, cells separated") {
    val rows = corpus(400).collect()
    val byCell = rows.groupBy(_.getInt(2)).values.filter(_.length >= 2)
    def dist(x: Seq[Float], y: Seq[Float]) =
      math.sqrt(x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum)
    // within-cell: per-dim noise is ±0.2, so pair distance is at most
    // 2·0.2·√dim = 1.6 (and typically far less)
    byCell.foreach { g =>
      val v = g.map(_.getSeq[Float](1))
      assert(dist(v(0), v(1)) <= 1.6)
    }
    // cross-cell pairs (different centers, per-dim spread ±1) are
    // farther than any within-cell pair on this seed — the clustered
    // property itself
    val within = byCell.map { g =>
      val v = g.map(_.getSeq[Float](1)); dist(v(0), v(1))
    }.max
    val reps = rows.groupBy(_.getInt(2)).values.map(_.head).toSeq
    val cross = (for (a <- reps; b <- reps if a.getLong(0) < b.getLong(0))
      yield dist(a.getSeq[Float](1), b.getSeq[Float](1))).min
    assert(cross > within,
      s"cross-cell min $cross should exceed within-cell max $within")
  }

  test("anisotropic: leading-dimension variance dominates trailing") {
    val rows = corpus(400, aniso = true).collect().map(_.getSeq[Float](1))
    def variance(j: Int): Double = {
      val xs = rows.map(_(j).toDouble)
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // weight (dim − j)/dim: dim 16 → dim 0 carries 16× dim 15's scale,
    // 256× its variance; assert a conservative 10×
    assert(variance(0) > 10 * variance(15),
      s"var(0)=${variance(0)} var(15)=${variance(15)}")
  }

  test("ClusteredEmbeddingExpr == the composed h60-chain form bit-for-bit") {
    import graft.text.TextAnalysis.h60
    // the pre-r14-optimization composed construction, verbatim
    def composed(id: org.apache.spark.sql.Column, dim: Int, k: Int,
        seed: Long, noiseMilli: Int, anisotropic: Boolean) = {
      val cell = Synthetic.clusterCell(id, k, seed)
      array((0 until dim).map { j =>
        val ctr = h60(concat(lit(s"ctr:$seed:"), cell.cast("string"),
          lit(s":$j"))) % lit(2001L) - lit(1000L)
        val noi = h60(concat(id.cast("string"), lit(s":n:$seed:$j"))) %
          lit(2001L) - lit(1000L)
        val base = ctr * lit(1000L) + noi * lit(noiseMilli.toLong)
        val (num, div) =
          if (anisotropic) (base * lit((dim - j).toLong), dim * 1e6)
          else (base, 1e6)
        (num / lit(div)).cast("float")
      }: _*)
    }
    for (aniso <- Seq(false, true); noise <- Seq(0, 300, 1000)) {
      val diff = spark.range(300).select(
          Synthetic.clusteredEmbedding(col("id"), dim = 16, k = 8, seed = 77L,
            noiseMilli = noise, anisotropic = aniso).as("a"),
          composed(col("id"), dim = 16, k = 8, seed = 77L,
            noiseMilli = noise, anisotropic = aniso).as("b"))
        .filter(not(col("a") === col("b")))
      assert(diff.isEmpty, s"aniso=$aniso noise=$noise")
    }
  }
}
