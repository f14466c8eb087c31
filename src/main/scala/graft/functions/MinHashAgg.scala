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
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
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

object MinHashFunctions {
  /** Aggregate a column of 64-bit shingle hashes into a `numPerm`-long
    * MinHash signature (`array<bigint>`). */
  def minhash_agg(shingleHash: Column, numPerm: Int): Column =
    GraftBridge.toColumn(
      MinHashAgg(GraftBridge.toExpression(shingleHash), numPerm)
        .toAggregateExpression())
}
