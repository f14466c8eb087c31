package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata.
  *
  * Image payloads get a REAL decode (javax.imageio header parse:
  * dimensions, frame count, format recognition); audio/video payloads
  * and unrecognizable blobs fall back to a deterministic sha256-derived
  * pseudo-decode (no AV codecs in this container). Everything around
  * the decode body — schema, typed Dataset plumbing, per-partition
  * batch shape, partition-preserving execution — is shared by both
  * paths and is what an ffmpeg-backed AV decoder would drop into:
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

  /** Real image decode: javax.imageio header parse — width/height (and
    * frame count for multi-frame containers like GIF) WITHOUT decoding
    * pixel data (`ImageReader.getWidth/getHeight` read the header only),
    * so a 100 TB scan pays bytes-in + header-parse, not full raster
    * decode. Returns None for payloads no installed reader recognizes
    * (then the deterministic fallback below keeps the pipeline total —
    * a corrupt blob must not kill a corpus pass). Audio/video would slot
    * in here the same way via an ffmpeg JNI binding — not available in
    * this container, so those kinds stay on the fallback path. */
  private def imageDecode(a: MediaAsset): Option[MediaFeatures] = {
    if (a.kind != "image") return None
    try {
      val iin = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iin)
        if (readers == null || !readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iin, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
            // allowSearch=true: GIF reports -1 without a search, and the
            // stream is an in-memory byte array, so counting frames is a
            // header walk, not I/O
            val frames = r.getNumImages(true) match {
              case n if n >= 1 => n
              case _           => 1
            }
            Some(MediaFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              r.getWidth(0), r.getHeight(0), frames, sha256Hex(a.payload)))
          } finally r.dispose()
        }
      } finally if (iin != null) iin.close()
    } catch { case _: Exception => None }
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Decode one asset: a REAL javax.imageio decode for recognizable
    * image payloads; a deterministic sha256-derived pseudo-decode for
    * everything else (no audio/video codecs in this container — the
    * fallback keeps every row present and the harness oracles
    * replayable, since the synthetic corpus's UTF-8 payloads all take
    * this path). The partitioning, batching and schema contract are
    * identical for both paths. */
  private def decodeOne(a: MediaAsset): MediaFeatures =
    imageDecode(a).getOrElse {
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
