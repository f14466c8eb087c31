package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries in this container); everything around it — schema, typed
  * Dataset plumbing, per-partition batch shape, partition-preserving
  * execution — is the real design that a libjpeg/ffmpeg-backed decoder
  * would drop into:
  *  - payloads stay `BinaryType` (never stringified),
  *  - metadata is a typed case class (columnar struct after encoding),
  *  - decode runs via `mapPartitions` over a typed Dataset so a native
  *    decoder could amortize per-partition init (codec contexts etc.),
  *  - nothing is collected to the driver.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed media-asset record: opaque payload + source metadata. */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features — what a real decoder would emit. */
  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: String)

  /** Harness adapter: manufacture binary "media" payloads from the
    * documents table (UTF-8 bytes stand in for encoded media). */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        // deterministic kind assignment in lieu of real container sniffing
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }

  /** STUB decode: deterministic pseudo-decode of the payload bytes.
    * A real implementation would replace ONLY the body of `decodeOne`
    * (e.g. javax.imageio / ffmpeg via JNI); the partitioning, batching and
    * schema contract stay identical. */
  private def decodeOne(a: MediaAsset): MediaFeatures = {
    // ??? <- real decoder goes here; deterministic fake below
    val n = a.payload.length.toLong
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(a.payload)
    val hex = h.map("%02x".format(_)).mkString
    // pseudo-dimensions derived from content so tests can assert stability
    val w = 64 + (java.lang.Byte.toUnsignedInt(h(0)) % 64)
    val ht = 64 + (java.lang.Byte.toUnsignedInt(h(1)) % 64)
    val frames = a.kind match {
      case "image" => 1
      case _       => 1 + (java.lang.Byte.toUnsignedInt(h(2)) % 120)
    }
    MediaFeatures(a.asset_id, a.kind, n, w, ht, frames, hex)
  }

  /** Distributed decode / feature-extract: partition-preserving (no
    * shuffle), typed in/out, per-partition iterator so a real codec can
    * init once per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init point (codec contexts, buffers) goes here
      it.map(decodeOne)
    }
  }

  /** Resize stub: emits the target dims, keeps payload opaque.
    * Demonstrates metadata-only transforms staying in codegen. */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame =
    features
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
          .otherwise(lit(maxDim).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling stub: one row per sampled frame index (1 fps-style
    * stride), via sequence+explode — a generator, not a driver loop. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("n_frames") > 1)
      .select(col("asset_id"), col("kind"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  val queries: Map[String, Q] = Map(
    // binary payload metadata — oracle-checkable (sha256/byte length are
    // engine-independent)
    "q70_multimodal_meta" -> { (s, d) =>
      val feats = extractFeatures(assetsFromDocuments(s, d)).toDF()
      feats.select(col("asset_id"), col("kind"), col("n_bytes"), col("checksum"))
        .orderBy("asset_id")
    },

    // full decode-stub feature table — the stub's pseudo-dims are sha256-
    // derived, so the oracle recomputes them from the same digest
    "q71_multimodal_features" -> { (s, d) =>
      extractFeatures(assetsFromDocuments(s, d)).toDF()
        .orderBy("asset_id")
    },

    // resize planning over decoded dims (oracle mirrors the stub dims)
    "q72_multimodal_resize" -> { (s, d) =>
      resizePlan(extractFeatures(assetsFromDocuments(s, d)).toDF(), maxDim = 96)
        .select("asset_id", "width", "height", "out_width", "out_height")
        .orderBy("asset_id")
    },

    // frame sampling fan-out (oracle mirrors the stub frame counts)
    "q73_multimodal_frames" -> { (s, d) =>
      sampleFrames(extractFeatures(assetsFromDocuments(s, d)).toDF(), stride = 30)
        .select(col("asset_id"), col("kind"), col("n_frames"),
          col("frame_idx").cast("int").as("frame_idx"))
        .orderBy("asset_id", "frame_idx")
    }
  )

  /** DuckDB mirror of the decode stub's pseudo-dimensions: byte k of
    * sha256(payload) is hex chars [2k+1, 2k+2]. */
  private val oracleDims =
    """CAST(64 + (('0x' || substr(sha256(text), 1, 2))::INT % 64) AS INTEGER) AS width,
      |  CAST(64 + (('0x' || substr(sha256(text), 3, 2))::INT % 64) AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
      |    ELSE 1 + (('0x' || substr(sha256(text), 5, 2))::INT % 120) END AS INTEGER)
      |    AS n_frames""".stripMargin

  val oracles: Map[String, String] = Map(
    "q70_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS checksum
        |FROM documents ORDER BY asset_id""".stripMargin,
    "q71_multimodal_features" ->
      s"""SELECT doc_id AS asset_id,
         |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |    ELSE 'video' END AS kind,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |  $oracleDims,
         |  sha256(text) AS checksum
         |FROM documents ORDER BY asset_id""".stripMargin,
    "q72_multimodal_resize" ->
      s"""WITH f AS (SELECT doc_id AS asset_id, $oracleDims FROM documents),
         |s AS (SELECT asset_id, width, height,
         |    CASE WHEN greatest(width, height) <= 96 THEN 1.0
         |      ELSE CAST(96 AS DOUBLE) / greatest(width, height) END AS scale
         |  FROM f)
         |SELECT asset_id, width, height,
         |  CAST(floor(width * scale) AS INTEGER) AS out_width,
         |  CAST(floor(height * scale) AS INTEGER) AS out_height
         |FROM s ORDER BY asset_id""".stripMargin,
    "q73_multimodal_frames" ->
      s"""WITH f AS (SELECT doc_id AS asset_id,
         |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS kind,
         |    $oracleDims
         |  FROM documents)
         |SELECT asset_id, kind, n_frames,
         |  CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_idx
         |FROM f WHERE n_frames > 1
         |ORDER BY asset_id, frame_idx""".stripMargin
  )
}
