package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

object SketchFunctions {
  /** Bloom membership probe of a bigint column. */
  def bloom_might_contain_long(key: Column, bloom: BloomFilter): Column =
    GraftBridge.toColumn(
      BloomMightContainLong(GraftBridge.toExpression(key), bloom))
}
