package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embedding synthesis — the production-shaped
  * corpus the ANN evidence was missing (r12 verdict): GenVecs' orthogonal
  * transforms preserve the testdata corpus's near-uniform-on-the-sphere
  * geometry, and three r12 conclusions (IVF recall rising with scale,
  * residual-PQ no-gain, LSH table-count escalation) were conditioned on
  * that distribution. Real embedding corpora are CLUSTERED — coarse
  * quantizer cells explain much of the variance, which is exactly why
  * FAISS defaults IndexIVFPQ to `by_residual=true`.
  *
  * Construction (every step integer-exact and engine-neutral, the q65
  * discipline):
  *  - cell(id)     = h60(id ‖ ":c:" ‖ seed) mod k — uniform over k centers
  *  - center(c)[j] = (h60("ctr:" ‖ seed ‖ ":" ‖ c ‖ ":" ‖ j) mod 2001 − 1000)
  *                   — lattice points of [-1000, 1000] per dimension
  *  - noise(id)[j] = (h60(id ‖ ":n:" ‖ seed ‖ ":" ‖ j) mod 2001 − 1000)
  *  - vec[j]       = float((center·1000 + noise·noiseMilli) / 1e6)
  *
  * The numerator is assembled in BIGINT, so the only float op is ONE
  * division + cast — both engines round identically, making a full
  * per-element hash compare possible (q174). `noiseMilli` sets the blob
  * radius as a fraction of the center lattice: 1000 = noise as wide as
  * the centers (≈ uniform corpus), 300 (default) = clearly clustered
  * blobs that still overlap in their tails, 50 = near-degenerate tight
  * clusters. All h60 inputs are plain string concats, replayable in
  * DuckDB as `CAST('0x' || substr(md5(…), 1, 15) AS BIGINT)`.
  *
  * This is LIBRARY surface (not a dev tool) deliberately: the oracle
  * query q174 pins the generator cross-engine, and tools/GenVecs'
  * `clustered` mode reuses the same expression — the ladder corpora and
  * the oracle fixture can never drift apart.
  */
object Synthetic {
  import graft.text.TextAnalysis.h60

  /** The vector's cluster assignment — h60 is non-negative (60-bit), so
    * plain mod equals pmod and replays as `%` in DuckDB. */
  def clusterCell(id: Column, k: Int, seed: Long): Column =
    (h60(concat(id.cast("string"), lit(s":c:$seed"))) % lit(k.toLong))
      .cast("int")

  /** The clustered embedding itself: `dim` floats around the id's cell
    * center. Pure per-row expression — synthesizing 100 TB of corpus is
    * a map stage with zero shuffles (2·dim md5 calls per row is the
    * whole cost).
    *
    * `anisotropic = true` scales dimension j by (dim − j)/dim — a
    * linearly decaying spectrum, the second production trait real
    * embeddings have beyond clustering: energy concentrates in leading
    * dimensions (PCA-like), which is exactly what makes contiguous PQ
    * slices unbalanced and an OPQ rotation worth paying for. Still one
    * BIGINT numerator and ONE float-producing division per element
    * (divider dim·1e6), so the anisotropic form replays cross-engine
    * exactly like the isotropic one. */
  def clusteredEmbedding(id: Column, dim: Int, k: Int, seed: Long,
      noiseMilli: Int = 300, anisotropic: Boolean = false): Column = {
    require(dim >= 1 && k >= 1 && noiseMilli >= 0 && noiseMilli <= 1000,
      s"dim=$dim k=$k noiseMilli=$noiseMilli out of range")
    // one codegen'd expression ([[graft.functions.ClusteredEmbeddingExpr]]):
    // the composed array-of-h60-chains form carried ~dim·2 md5 subtrees
    // per plan AND re-hashed every (cell, j) center per ROW; the
    // expression precomputes the k×dim center lattice once and pays
    // dim+1 md5 calls per row — bit-identical values (spec-pinned
    // against the composed form; q174 pins the whole construction
    // against DuckDB's replay)
    graft.functions.SyntheticFunctions.clustered_embedding(
      id, dim, k, seed, noiseMilli, anisotropic)
  }
}
