package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

/** [[graft.sim.Synthetic.clusteredEmbedding]] as ONE codegen'd
  * expression. The composed form is an `array` of dim subtrees, each
  * with two full h60 chains (md5 → substring → conv → cast) plus the
  * shared cell subtree — thousands of plan nodes, and the CENTER hash
  * `h60("ctr:seed:cell:j")` is re-computed per ROW although it only
  * depends on (cell, j): k·dim distinct values. Here the center lattice
  * is precomputed once at construction (k·dim md5 calls, driver-side,
  * KiB) and each row pays exactly dim+1 md5 calls (noise + cell) — the
  * minimum the construction defines.
  *
  * Exactness: `h60(s) = conv(substring(md5(s), 1, 15), 16, 10)` is the
  * first 60 bits of the md5 digest, extracted here directly from the
  * digest bytes; every subsequent step is the same integer arithmetic
  * (BIGINT numerator, one double division, one float cast) the
  * composed tree evaluates — bit-identical outputs (spec-pinned
  * against the composed form; q174 pins it against DuckDB). */
case class ClusteredEmbeddingExpr(child: Expression, dim: Int, k: Int,
    seed: Long, noiseMilli: Int, anisotropic: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an integral id, got ${other.simpleString}")
    }
  // matches the composed array(...cast(float)) element nullability
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def prettyName: String = "clustered_embedding"

  // center(c)(j) = h60("ctr:seed:c:j") % 2001 − 1000 — k·dim longs,
  // computed once per expression instance (driver-side at plan time)
  @transient private lazy val centers: Array[Array[Long]] =
    Array.tabulate(k, dim)((c, j) =>
      ClusteredEmbeddingExpr.h60(s"ctr:$seed:$c:$j") % 2001L - 1000L)

  override def nullSafeEval(idv: Any): Any = {
    val id = idv match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case l: Long => l
      case i: Int => i.toLong
    }
    ClusteredEmbeddingExpr.compute(id, centers, dim, k, seed, noiseMilli,
      anisotropic)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ctr = ctx.addReferenceObj("centers", centers, "long[][]")
      s"""${ev.value} = graft.functions.ClusteredEmbeddingExpr.compute(
         |  (long) $v, $ctr, $dim, $k, ${seed}L, $noiseMilli, $anisotropic);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ClusteredEmbeddingExpr =
    copy(child = newChild)
}

object ClusteredEmbeddingExpr {
  /** `conv(substring(md5(s), 1, 15), 16, 10)` — the first 60 bits of
    * the md5 digest of the UTF-8 bytes, non-negative. */
  def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) >> 4) & 0xFL)
  }

  def compute(id: Long, centers: Array[Array[Long]], dim: Int, k: Int,
      seed: Long, noiseMilli: Int, anisotropic: Boolean): ArrayData = {
    val cell = (h60(s"$id:c:$seed") % k.toLong).toInt
    val ctr = centers(cell)
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val noi = h60(s"$id:n:$seed:$j") % 2001L - 1000L
      val base = ctr(j) * 1000L + noi * noiseMilli.toLong
      out(j) =
        if (anisotropic) ((base * (dim - j).toLong) / (dim * 1e6)).toFloat
        else (base / 1e6).toFloat
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

object SyntheticFunctions {
  /** Clustered embedding synthesis as one expression. */
  def clustered_embedding(id: Column, dim: Int, k: Int, seed: Long,
      noiseMilli: Int, anisotropic: Boolean): Column =
    GraftBridge.toColumn(ClusteredEmbeddingExpr(
      GraftBridge.toExpression(id), dim, k, seed, noiseMilli, anisotropic))
}
