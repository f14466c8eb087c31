package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{nearest_cell, vec_dot}

/** Product quantization (PQ) — the MEMORY path for 100 TB similarity
  * search, complementing [[IvfIndex]] (the I/O path) and the hyperplane
  * LSH (the bucketing path).
  *
  * A `dim`-float vector (256 bytes at dim 64) compresses to `m` small
  * integer codes (m bytes at ksub ≤ 256): each of the `m` subspaces of
  * `dsub = dim/m` dims gets its own `ksub`-centroid codebook, and a
  * vector stores only its nearest sub-centroid per subspace — 16-32×
  * less memory, so a corpus that needed a cluster's disks fits in its
  * RAM. Search is asymmetric distance computation (ADC): the query
  * stays exact, each pair cost is `m` table lookups instead of `dim`
  * multiplies, and the scan reads only the code column. IVF∘PQ composes
  * by construction: partition by [[IvfIndex]] cell, store THIS module's
  * codes inside each cell, probe + ADC-scan.
  *
  * Determinism (the q65 discipline, per subspace):
  *  - init: sub-slices of the `ksub` lowest-`h60(id:seed)` vectors;
  *  - Lloyd: ONE map-side-combining aggregation per iteration over the
  *    (vector × subspace) relation, `floor(x·1e9)` BIGINT coordinate
  *    sums — centroids are identical under any partitioning;
  *  - encode: nearest sub-centroid under the TRAINED double codebook;
  *  - ADC: the served codebook is float-rounded; every per-subspace
  *    distance term is fixed-pointed (`floor(·1e9)` long) BEFORE the
  *    per-pair sum, so the total is exact integer math and the ranking
  *    has no float-order or tie ambiguity anywhere.
  * The entire train→encode→search path is therefore replayable by the
  * DuckDB oracle (q133 is a full hash compare).
  */
object PqIndex {

  /** `centroids(sub)(cell)` is a `dsub`-dim double sub-centroid. */
  final case class Codebook(dim: Int, m: Int, ksub: Int,
      centroids: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    /** Float-rounded serving copy (what a FAISS index stores); ADC
      * distance tables are built from THIS, mirroring q65's served
      * `Model.centroids`. */
    def served: Array[Array[Array[Double]]] =
      centroids.map(_.map(_.map(x => x.toFloat.toDouble)))
  }

  /** Left-to-right |c|² fold — the same index-ascending op order as
    * DuckDB's `list_aggregate(list_transform(c, x -> x*x), 'sum')`, so
    * the double embedded as a plan literal equals the oracle's value
    * bit for bit. */
  private def norm2(c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Per-(sub, subvec) nearest-cell assignment: an m-branch CASE over
    * the per-subspace [[nearest_cell]] matrices (each a codegen
    * reference object — one compiled class per subspace across all
    * Lloyd iterations). */
  private def assignBySub(cents: Array[Array[Array[Double]]]): Column =
    cents.zipWithIndex.tail.foldLeft(nearest_cell(col("subvec"), cents(0))) {
      case (acc, (mat, j)) =>
        when(col("sub") === j, nearest_cell(col("subvec"), mat)).otherwise(acc)
    }

  /** Train all `m` sub-quantizers in ONE Lloyd loop over the exploded
    * (vector × subspace) relation — each iteration is a single
    * aggregation onto `m·ksub` keys (map-side combined; the collected
    * state is KiB regardless of corpus size). */
  def train(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, seed: Long = 42L, maxIter: Int = 2): Codebook = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val initHash = graft.text.TextAnalysis.h60(
      concat(col(idCol).cast("string"), lit(":"), lit(seed).cast("string")))
    val initRows = corpus.select(col(vecCol)).orderBy(initHash, col(idCol))
      .limit(ksub).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(initRows.length == ksub, s"corpus smaller than ksub=$ksub")
    val cents: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((j, c) => initRows(c).slice(j * dsub, (j + 1) * dsub))
    val subs = corpus
      .select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col(vecCol))
      .select(col(idCol), col("sub"),
        slice(col(vecCol), col("sub") * dsub + 1, lit(dsub)).as("subvec"))
    val sums = (0 until dsub).map(i =>
      sum(floor(element_at(col("subvec"), i + 1).cast("double") * lit(1e9))
        .cast("long")).as(s"s_$i"))
    for (_ <- 0 until maxIter) {
      val stats = subs.withColumn("cell", assignBySub(cents))
        .groupBy("sub", "cell")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      // empty cells keep their previous sub-centroid
      stats.foreach { r =>
        val j = r.getAs[Int]("sub"); val cell = r.getAs[Int]("cell")
        val n = r.getAs[Long]("n").toDouble
        cents(j)(cell) = Array.tabulate(dsub)(i => r.getAs[Long](s"s_$i") / n / 1e9)
      }
    }
    Codebook(dim, m, ksub, cents)
  }

  /** Compress the corpus to (id, codes): `m` nearest-sub-centroid ids
    * per vector under the trained codebook. A pure map stage — zero
    * shuffles — and the natural full-corpus rewrite that turns a
    * 100 TB float store into a few TB of codes. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: Codebook): DataFrame =
    corpus.select(col(idCol),
      array((0 until cb.m).map(j =>
        nearest_cell(slice(col(vecCol), j * cb.dsub + 1, cb.dsub),
          cb.centroids(j))): _*).as("codes"))

  /** Per-query ADC distance table as a plan literal: entry
    * `j·ksub + cell` holds `floor((|c|² − 2·q_j·c) · 1e9)` — the
    * rank-equivalent Euclidean form (the `|q_j|²` constant per query is
    * dropped, exactly like [[IvfIndex]]'s probe distance), fixed-pointed
    * per SUBSPACE so the per-pair total is an exact long sum. */
  private def dtabFp(cb: Codebook, qVec: Column): Column = {
    val served = cb.served
    array((for (j <- 0 until cb.m; c <- 0 until cb.ksub) yield {
      val cent = served(j)(c)
      floor((lit(norm2(cent)) - lit(2.0) *
        vec_dot(slice(qVec, j * cb.dsub + 1, cb.dsub),
          typedLit(cent.map(_.toFloat).toSeq))) * lit(1e9)).cast("long")
    }): _*)
  }

  /** ADC top-k: broadcast the queries (each carrying its distance-table
    * literal plan), stream the CODE column of the corpus once — per
    * pair, `m` array lookups and an exact long sum; the only shuffle is
    * the per-query top-k window over (query, neighbor, adist) rows.
    * `adist_fp` is the fixed-point distance (hash-exact); `adist` its
    * double form. */
  def searchADC(cb: Codebook, codes: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      dtabFp(cb, col(vecCol)).as("dtab")))
    val w = Window.partitionBy("query_id").orderBy(asc("adist_fp"), asc("neighbor_id"))
    codes.withColumnRenamed(idCol, "neighbor_id")
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist_fp",
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(cb.m - 1)),
            (c, j) => element_at(col("dtab"), j * cb.ksub + c + 1)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("adist_fp"),
        (col("adist_fp").cast("double") / lit(1e9)).as("adist"))
  }
}
