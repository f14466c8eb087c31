package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

/** MinHash signature as ONE native aggregate: `numPerm` running minima
  * over a pre-hashed shingle stream, kept in a single primitive long[]
  * buffer with map-side partial aggregation (ObjectHashAggregate).
  *
  * The composed alternative — `numPerm` separate `min(xxhash64(h, i))`
  * aggregate columns — is semantically identical (this class reproduces
  * the exact same hash chain: seed 42 over (h: long, i: int)) but
  * generates a 64-wide aggregation schema whose codegen compiles for
  * seconds and whose per-row update path re-evaluates 64 expression
  * nodes. Here the update is one tight loop; the shuffle carries one
  * binary buffer per group instead of 64 columns.
  *
  * At the 100 TB design point the input is (doc_id, shingle_hash) pairs;
  * the partial-aggregate buffer per doc is numPerm×8 bytes regardless of
  * document length, so the shuffle volume is bounded by the corpus's
  * document count, never its token count.
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    affine: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  @transient private lazy val params: Array[(Long, Long)] =
    MinHashAgg.affineParams(numPerm)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (affine) {
        // (a_i·h + b_i) mod 2^61−1 — the classic universal-hash family,
        // REPLAYABLE BY THE ORACLE: DuckDB computes the identical values
        // in HUGEINT arithmetic from the same (a_i, b_i) literals
        // (Dedup.q53 oracle). Requires 0 ≤ h < 2^60 (the h60 token hash).
        var i = 0
        while (i < numPerm) {
          val (a, b) = params(i)
          val hi = MinHashAgg.affinePerm(a, b, h)
          if (hi < buffer(i)) buffer(i) = hi
          i += 1
        }
      } else {
        // xxhash64(h, i) with Spark's seed chain: seed 42 → hashLong(h) →
        // hashInt(i) — identical values to the composed min(xxhash64(h, lit(i)))
        val base = XXH64.hashLong(h, 42L)
        var i = 0
        while (i < numPerm) {
          val hi = XXH64.hashInt(i, base)
          if (hi < buffer(i)) buffer(i) = hi
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numPerm * 8)
    var i = 0
    while (i < numPerm) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(numPerm)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Mersenne prime 2^61 − 1 — the modulus of the affine family. */
  val P: Long = (1L << 61) - 1

  /** Deterministic affine-permutation parameters: a_i ∈ [1, P),
    * b_i ∈ [0, P), derived from XXH64 so every executor (and the oracle
    * generator) sees the same family without a stored model. */
  def affineParams(numPerm: Int): Array[(Long, Long)] =
    Array.tabulate(numPerm) { i =>
      val a = java.lang.Long.remainderUnsigned(XXH64.hashInt(2 * i, 7L), P - 1) + 1
      val b = java.lang.Long.remainderUnsigned(XXH64.hashInt(2 * i + 1, 7L), P)
      (a, b)
    }

  /** `(a·h) mod P` without 128-bit types: P is Mersenne (2^61 ≡ 1 mod P),
    * so the 128-bit product `hi·2^64 + lo` reduces to
    * `8·hi + (lo >>> 61) + (lo & P)`. For a < P and h < 2^63 the first
    * term `8·hi` alone can reach ~2^63, so it is folded once BEFORE the
    * `(lo & P)` add — every intermediate then stays well under 2^62 and
    * the whole signed-positive domain 0 ≤ h < 2^63 is exact (not just
    * h < 2^61). Exactness is property-tested against BigInteger across
    * the full domain (MinHashAggSpec). Requires 0 ≤ a < P, 0 ≤ h. */
  @inline def mulModP(a: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    var q = (hi << 3) | (lo >>> 61) // = floor(a·h / 2^61), up to ~2^63
    q = (q >>> 61) + (q & P) // fold before adding: keeps the sum < 2^62
    var r = q + (lo & P)
    r = (r >>> 61) + (r & P)
    if (r >= P) r - P else r
  }

  /** `(a·h + b) mod P`. */
  @inline def affinePerm(a: Long, b: Long, h: Long): Long = {
    val r = mulModP(a, h) + b
    if (r >= P) r - P else r
  }
}

object MinHashFunctions {
  /** Aggregate a column of 64-bit shingle hashes into a `numPerm`-long
    * MinHash signature (`array<bigint>`). `affine = true` selects the
    * oracle-replayable `(a·h + b) mod 2^61−1` permutation family. */
  def minhash_agg(shingleHash: Column, numPerm: Int,
      affine: Boolean = false): Column =
    GraftBridge.toColumn(
      MinHashAgg(GraftBridge.toExpression(shingleHash), numPerm, affine)
        .toAggregateExpression())
}
