package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) key of two non-negative bigint columns: the lower
  * `bitsPerDim` bits of each dimension, interleaved — bit `j` of the
  * left lands at position `2j+0`, of the right at `2j+1`.
  *
  * This is a DATA-LAYOUT primitive, not a query operator: sorting or
  * range-partitioning a 100 TB table by the interleaved key clusters
  * rows that are close in BOTH dimensions into the same files, so
  * per-file min/max statistics become tight rectangles and a filter on
  * either dimension (or both) skips most files at scan time — the
  * standard multi-dimensional clustering trick single-column sort
  * cannot give. Pair with [[graft.ops.Extended.zorderLayout]].
  *
  * `bitsPerDim ≤ 30` keeps the key under 2^60, where every downstream
  * shift/sum is overflow-free in both engines — the oracle rebuilds the
  * identical key from `((x >> j) & 1) << (2j)` terms in plain BIGINT
  * arithmetic. Negative inputs are a caller error (require a prior
  * offset); bits above `bitsPerDim` are ignored.
  */
case class ZOrderKey2(left: Expression, right: Expression, bitsPerDim: Int)
    extends BinaryExpression {

  require(bitsPerDim > 0 && bitsPerDim <= 30, "need 1 <= bitsPerDim <= 30")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bitsPerDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val key = ctx.freshName("key")
      s"""
         |long $key = 0L;
         |for (int $j = 0; $j < $bitsPerDim; $j++) {
         |  $key |= (($a >>> $j) & 1L) << (2 * $j);
         |  $key |= (($b >>> $j) & 1L) << (2 * $j + 1);
         |}
         |${ev.value} = $key;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey2 {
  /** Reference interleave (also the JVM half of the spec's equivalence
    * test against the oracle's shift-or SQL). */
  def interleave(x: Long, y: Long, bitsPerDim: Int): Long = {
    var key = 0L
    var j = 0
    while (j < bitsPerDim) {
      key |= ((x >>> j) & 1L) << (2 * j)
      key |= ((y >>> j) & 1L) << (2 * j + 1)
      j += 1
    }
    key
  }

  /** The oracle's side: the same key as a DuckDB SQL expression over
    * column names — `((x >> j) & 1) << 2j | ...` terms, plain BIGINT. */
  def oracleSqlExpr(x: String, y: String, bitsPerDim: Int): String =
    (0 until bitsPerDim).flatMap { j =>
      Seq(s"((($x >> $j) & 1) << ${2 * j})",
        s"((($y >> $j) & 1) << ${2 * j + 1})")
    }.mkString(" | ")
}

object LayoutFunctions {
  /** Morton-interleaved clustering key of two bigint columns. */
  def zorder_key(x: Column, y: Column, bitsPerDim: Int = 30): Column =
    GraftBridge.toColumn(ZOrderKey2(GraftBridge.toExpression(x),
      GraftBridge.toExpression(y), bitsPerDim))
}
