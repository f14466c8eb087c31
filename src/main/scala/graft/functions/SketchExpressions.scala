package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a long key.
  *
  * The filter rides `ctx.addReferenceObj`, so the generated source is
  * tiny and constant across plans (janino cache hits — the same rule as
  * `LangIdBest`/`NearestCell`), and the probe stays inside whole-stage
  * codegen. A ~1 MB filter over 10⁶ keys replaces a join probe per row
  * with two hash computations — the pre-shuffle pruning step of
  * [[graft.ops.Extended.bloomSemiJoin]].
  *
  * May return false positives (by `fpp`), never false negatives —
  * callers that need exactness must confirm survivors with a real join.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires bigint, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Count-Min sketch over a stream of pre-hashed keys, as ONE native
  * aggregate: a `depth × width` counter matrix in a single primitive
  * long[] buffer with map-side partial aggregation.
  *
  * Row hashes are the same oracle-replayable affine family as
  * [[MinHashAgg]] — `bucket_i(h) = ((a_i·h + b_i) mod 2^61−1) mod width`
  * with `(a_i, b_i)` derived deterministically from XXH64 — so DuckDB
  * can rebuild the identical counter matrix in HUGEINT arithmetic from
  * the same literals, which is what makes heavy-hitter queries over the
  * sketch FULLY oracle-checkable rather than rows-only. Requires
  * `0 ≤ h < 2^60` (the h60 token hash).
  *
  * At the 100 TB design point this replaces the token-frequency
  * `groupBy(token)` — a vocabulary-sized shuffle of trillions of rows —
  * with a fixed `depth·width·8`-byte buffer (32 KB at 4×1024) that is
  * combined map-side and reduced to a single row: shuffle volume is
  * O(partitions), independent of the corpus. Estimates overestimate
  * only (by collision), never undercount.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "need depth > 0 and width > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  @transient private lazy val params: Array[(Long, Long)] =
    MinHashAgg.affineParams(depth)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val (a, b) = params(i)
        val bucket = (MinHashAgg.affinePerm(a, b, h) % width).toInt
        buffer(i * width + bucket) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Point estimate from a [[CountMinAgg]] sketch: `min` over the `depth`
  * rows of the counter each row hashes the key to. Codegen'd — the
  * probe is two multiplies and an array read per row, fully inside
  * whole-stage codegen, so estimating every member of a
  * vocabulary-sized probe set is a pure map stage. */
case class CmsEstimateLong(left: Expression, right: Expression,
    depth: Int, width: Int) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_long"

  @transient private lazy val params: Array[(Long, Long)] =
    MinHashAgg.affineParams(depth)

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val arr = sketch.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val h = key.asInstanceOf[Long]
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val (a, b) = params(i)
      val bucket = (MinHashAgg.affinePerm(a, b, h) % width).toInt
      val v = arr.getLong(i * width + bucket)
      if (v < est) est = v
      i += 1
    }
    est
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, h) => {
      val as = ctx.addReferenceObj("cmsA", params.map(_._1), "long[]")
      val bs = ctx.addReferenceObj("cmsB", params.map(_._2), "long[]")
      val i = ctx.freshName("i")
      val est = ctx.freshName("est")
      val bkt = ctx.freshName("bkt")
      val v = ctx.freshName("v")
      s"""
         |long $est = Long.MAX_VALUE;
         |for (int $i = 0; $i < $depth; $i++) {
         |  int $bkt = (int) (graft.functions.MinHashAgg.affinePerm(
         |    $as[$i], $bs[$i], $h) % ${width}L);
         |  long $v = $sk.getLong($i * $width + $bkt);
         |  if ($v < $est) $est = $v;
         |}
         |${ev.value} = $est;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateLong =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  /** Bloom membership probe of a bigint column. */
  def bloom_might_contain_long(key: Column, bloom: BloomFilter): Column =
    GraftBridge.toColumn(
      BloomMightContainLong(GraftBridge.toExpression(key), bloom))

  /** Aggregate a column of 60-bit key hashes into a `depth×width`
    * Count-Min counter matrix (`array<bigint>`, row-major). */
  def count_min_agg(keyHash: Column, depth: Int, width: Int): Column =
    GraftBridge.toColumn(
      CountMinAgg(GraftBridge.toExpression(keyHash), depth, width)
        .toAggregateExpression())

  /** Estimated count of `keyHash` from a [[count_min_agg]] sketch. */
  def cms_estimate_long(sketch: Column, keyHash: Column,
      depth: Int, width: Int): Column =
    GraftBridge.toColumn(
      CmsEstimateLong(GraftBridge.toExpression(sketch),
        GraftBridge.toExpression(keyHash), depth, width))
}
