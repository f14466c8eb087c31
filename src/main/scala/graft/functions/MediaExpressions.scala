package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit perceptual difference hash (dHash) of an encoded image
  * payload — the image member of the near-dup fingerprint family.
  * LLM pipelines dedup images PERCEPTUALLY (a recolored or re-encoded
  * copy of the same picture is the same training example); byte-level
  * sha256 can't see that, embeddings are a model away. dHash is the
  * classic cheap answer: downsample to a tiny grayscale grid, emit one
  * bit per adjacent-column brightness comparison — gradients survive
  * global recoloring/brightness shifts, so twins collide while distinct
  * images land ~30 bits apart.
  *
  * Geometry: 11×6 block-mean grid → 10 comparisons × 6 rows = exactly
  * 60 bits, the width the simhash blocking machinery already serves —
  * `Dedup.simHashNearDupsFromFps` pigeonhole-blocks these fingerprints
  * unchanged (4×15-bit quarters, exact for hamming ≤ 3).
  *
  * Determinism: all-integer arithmetic — block means are integer box
  * partitions with truncating division over `(299r + 587g + 114b)/1000`
  * grays. Lossless formats (PNG/GIF/BMP) decode bit-identically
  * everywhere; JPEG pixel values are codec-dependent, so cross-JVM
  * hash stability is only contracted for lossless inputs. Payloads no
  * installed reader decodes take the sha256-derived 60-bit fallback
  * (first 15 hex chars — the h60 discipline, replayable in SQL), so
  * the expression is TOTAL and a corrupt blob never kills a corpus
  * pass. */
object ImageDHash {
  val Cols = 11
  val Rows = 6

  // The same magic-byte gate [[graft.mm.Multimodal]] documents for its
  // decode path: every image container the JDK can read has a fixed
  // leading magic (PNG/JPEG/GIF/BMP/TIFF, WBMP's weak 0x00 0x00), so
  // gating loses no true decodes — and WITHOUT it, ImageIO walks the
  // whole provider registry per payload (reader discovery + stream
  // setup per row) on a corpus where most payloads are not images at
  // all. Measured on q182: the ungated form paid that walk on every
  // row of a text-payload corpus.
  // ASSUMPTION (stated for deployments, not a concern here): the magic
  // whitelist matches the STOCK JDK reader set. A JVM with a service-
  // loaded third-party ImageIO plugin whose container has a different
  // magic would take the sha256 fallback for payloads that plugin could
  // decode; such a deployment should derive the gate from the
  // registered ImageReaderSpis' format magics instead.
  private def m(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && m(b, 1, "PNG")) ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      m(b, 0, "GIF8") || m(b, 0, "BM") ||
      (m(b, 0, "II") && b(2) == 0x2A && b(3) == 0) ||
      (m(b, 0, "MM") && b(2) == 0 && b(3) == 0x2A) ||
      (b(0) == 0 && b(1) == 0))

  /** Pixel-path dHash; null when no installed reader decodes the
    * payload (caller falls back). */
  def tryDecode(payload: Array[Byte]): java.lang.Long = {
    if (!looksLikeImage(payload)) return null
    try {
      // MemoryCacheImageInputStream: the bare InputStream overload wraps
      // in a temp-FILE-backed cache stream (ImageIO.getUseCache default)
      // — a per-row disk write; the payload is already in memory
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return null
      val g = new Array[Long](Rows * Cols)
      var r = 0
      while (r < Rows) {
        var c = 0
        while (c < Cols) {
          val x0 = c * w / Cols
          val x1 = math.min(w, math.max(x0 + 1, (c + 1) * w / Cols))
          val y0 = r * h / Rows
          val y1 = math.min(h, math.max(y0 + 1, (r + 1) * h / Rows))
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
                114L * (rgb & 0xFF)) / 1000L
              n += 1
              x += 1
            }
            y += 1
          }
          g(r * Cols + c) = if (n == 0) 0L else sum / n
          c += 1
        }
        r += 1
      }
      var bits = 0L
      var k = 0
      r = 0
      while (r < Rows) {
        var c = 0
        while (c < Cols - 1) {
          if (g(r * Cols + c) > g(r * Cols + c + 1)) bits |= (1L << k)
          k += 1
          c += 1
        }
        r += 1
      }
      java.lang.Long.valueOf(bits)
    } catch { case _: Exception => null }
  }

  /** sha256-derived 60-bit fallback — `'0x' || substr(sha256_hex, 1,
    * 15)` in DuckDB terms, the cross-engine replay the q182 oracle
    * leans on. */
  def fallback(payload: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    // the first 15 hex chars = the digest's first 60 bits, extracted
    // directly (the hex round-trip paid 32 String.format calls per row)
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) >> 4) & 0xFL)
  }

  /** The total form the expression evaluates. */
  def eval(payload: Array[Byte]): Long = {
    val d = tryDecode(payload)
    if (d != null) d.longValue() else fallback(payload)
  }
}

/** `image_dhash(payload)` as a codegen'd Catalyst expression: the
  * generated code is one static call into [[ImageDHash.eval]], so the
  * surrounding whole-stage pipeline stays fused (the decode itself is
  * JVM work either way — what matters is not breaking codegen for the
  * columns around it). NULL payload → NULL hash. */
case class ImageDHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary argument, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"
  override protected def nullSafeEval(input: Any): Any =
    ImageDHash.eval(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageDHash.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageDHashExpr =
    copy(child = newChild)
}

object MediaFunctions {
  /** Column-level entry point for [[ImageDHashExpr]]. */
  def image_dhash(payload: Column): Column =
    GraftBridge.toColumn(ImageDHashExpr(GraftBridge.toExpression(payload)))
}
