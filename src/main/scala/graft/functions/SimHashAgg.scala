package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

/** SimHash fingerprint as ONE native aggregate: per-bit ±1 majority votes
  * over a pre-hashed token stream, kept in a single primitive int[bits]
  * buffer with map-side partial aggregation (ObjectHashAggregate).
  *
  * The composed alternative — `bits` separate conditional `sum` columns
  * assembled into a long — is semantically identical but carries a
  * 60-wide aggregation schema whose generated code is large enough that
  * plan compilation dominates the query at small scale, and whose
  * fingerprint-assembly projection is a 60-term expression tree that
  * CollapseProject happily clones into every downstream use. Here the
  * aggregate yields the finished fingerprint as one plain column.
  *
  * Votes are ints, not longs: a single document would need 2^31 tokens to
  * overflow a bucket, and the partial-aggregate buffer per doc is
  * bits×4 bytes regardless of document length, so shuffle volume is
  * bounded by document count, never token count.
  *
  * Semantics match the SQL-expressible vote table exactly (bit b set iff
  * strictly more tokens have bit b set than clear; empty docs → 0), so
  * the DuckDB oracle for the SimHash family is unchanged.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(bits > 0 && bits <= 64, "simhash_agg supports 1..64 bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < bits) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (buffer(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 4)
    var b = 0
    while (b < bits) { bb.putInt(buffer(b)); b += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashFunctions {
  /** Aggregate a column of token hashes into a `bits`-wide SimHash
    * fingerprint (bigint; bit b = majority vote of the tokens' bit b). */
  def simhash_agg(tokenHash: Column, bits: Int): Column =
    GraftBridge.toColumn(
      SimHashAgg(GraftBridge.toExpression(tokenHash), bits)
        .toAggregateExpression())
}
