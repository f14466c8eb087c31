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

  /** Container sniffing: cheap magic-byte checks that run BEFORE any
    * format machinery. At corpus scale this is the difference between
    * a branch on 4 bytes and a per-row provider-registry walk (imageio
    * reader discovery, javax.sound readers that each throw an internal
    * UnsupportedAudioFileException on a miss) — on a 100 TB corpus where
    * most payloads are NOT in a given container, the probe must be
    * O(bytes-looked-at)=4, not O(providers×exceptions). Real ingest
    * pipelines sniff magics first for exactly this reason (`file(1)`
    * does the same). Every container the JDK can actually read has a
    * fixed magic, so gating on them loses no true decodes:
    * image — PNG \x89PNG, JPEG FFD8, GIF 'GIF8', BMP 'BM', TIFF II/MM,
    * WBMP 0x00 0x00 (weak, but 2 zero bytes never lead a text payload);
    * audio — WAV 'RIFF', AIFF/AIFC 'FORM', AU '.snd';
    * video — an ISO-BMFF top-level box type in bytes 4..8 ('ftyp' and
    * the handful of other legal leading boxes). */
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

  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && (m(b, 0, "RIFF") || m(b, 0, "FORM") || m(b, 0, ".snd"))

  private val mp4LeadingBoxes =
    Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pnot", "uuid")
  private def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && mp4LeadingBoxes.contains(new String(b, 4, 4, "ISO-8859-1"))

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
    if (a.kind != "image" || !looksLikeImage(a.payload)) return None
    try {
      // explicit MemoryCacheImageInputStream: ImageIO.createImageInputStream
      // wraps an InputStream in a temp-FILE-backed cache stream when
      // ImageIO.getUseCache (default true) — a per-row disk write a corpus
      // scan must never pay; the payload is already an in-memory array
      val iin = new javax.imageio.stream.MemoryCacheImageInputStream(
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

  /** Real audio decode: `javax.sound.sampled` header parse — the JDK
    * ships WAV/AIFF/AU container readers the same way it ships imageio,
    * so uncompressed audio gets a true decode with no external codecs.
    * `getAudioFileFormat` reads the container header only (never the
    * sample data), so a corpus scan pays bytes-in + header-parse.
    * Feature mapping for the image-shaped schema: `width` = sample rate
    * (Hz), `height` = channel count, `n_frames` = sample frames (the
    * audio meaning of "frame": one sample across all channels).
    * Compressed formats (mp3/ogg/aac) have no JDK reader and fall
    * through to the deterministic fallback — where an ffmpeg JNI
    * binding would slot in. */
  private def audioDecode(a: MediaAsset): Option[MediaFeatures] = {
    if (a.kind != "audio" || !looksLikeAudio(a.payload)) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(a.payload))
      val fmt = aff.getFormat
      val frames = if (aff.getFrameLength > 0) aff.getFrameLength else 1
      Some(MediaFeatures(a.asset_id, a.kind, a.payload.length.toLong,
        fmt.getSampleRate.toInt, fmt.getChannels, frames,
        sha256Hex(a.payload)))
    } catch { case _: Exception => None } // not a JDK-readable container
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Real video decode: MP4/MOV container box walk (ISO/IEC 14496-12 —
    * a public byte format, parseable with no codec). Boxes are
    * `[4-byte big-endian size][4-byte type][payload]` (size 1 → 64-bit
    * largesize follows the type, the form muxers use for a >4 GiB
    * `mdat`; size 0 → box extends to end of file — both handled, since
    * an `mdat` BEFORE `moov` is common muxer output and must be stepped
    * over, not declared malformed). The walk picks the VIDEO trak —
    * `mdia.hdlr` handler `'vide'`, falling back to the first trak with
    * nonzero `tkhd` dims (real files often mux the audio trak first;
    * taking trak #1 blindly would report 0×0 and the audio sample
    * count) — then reads `tkhd` width/height (16.16 fixed point at
    * payload offset 76 for version 0, 88 for version 1) and the exact
    * frame count from `mdia.minf.stbl.stsz`. Header-only: sample DATA
    * is never touched, so a corpus scan pays bytes-in + box walk.
    * Returns None for anything that isn't a well-formed MP4/MOV
    * (→ deterministic fallback). */
  private def mp4Decode(a: MediaAsset): Option[MediaFeatures] = {
    if (a.kind != "video" || !looksLikeMp4(a.payload)) return None
    val b = a.payload
    def u32(off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String =
      new String(b, off, 4, "ISO-8859-1")
    // all child boxes of [start, end) with the given type, as
    // (payloadStart, payloadEnd); largesize and to-end-of-range boxes
    // are stepped over/into, a malformed size stops the scan
    def children(start: Int, end: Int, typ: String): List[(Int, Int)] = {
      val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val size32 = u32(off)
        val (payloadStart, boxEnd) = size32 match {
          case 0 => (off + 8, end.toLong)            // extends to end
          case 1 if off + 16 <= end => (off + 16, off + u64(off + 8)) // largesize
          case s if s >= 8 => (off + 8, off + s)
          case _ => (off + 8, -1L)                   // malformed
        }
        if (boxEnd < payloadStart || boxEnd > end) ok = false
        else {
          if (fourcc(off + 4) == typ) out += ((payloadStart, boxEnd.toInt))
          off = boxEnd.toInt
          if (boxEnd == end.toLong) ok = false       // consumed the range
        }
      }
      out.toList
    }
    def child(start: Int, end: Int, typ: String): Option[(Int, Int)] =
      children(start, end, typ).headOption
    def trakDims(trakS: Int, trakE: Int): (Int, Int) =
      child(trakS, trakE, "tkhd").map { case (tkhdS, tkhdE) =>
        val v = b(tkhdS) & 0xFF
        val whOff = tkhdS + (if (v == 1) 88 else 76)
        if (whOff + 8 <= tkhdE) ((u32(whOff) >> 16).toInt, (u32(whOff + 4) >> 16).toInt)
        else (0, 0)
      }.getOrElse((0, 0))
    def isVideoTrak(trakS: Int, trakE: Int): Boolean = (for {
      (mdiaS, mdiaE) <- child(trakS, trakE, "mdia")
      (hdlrS, hdlrE) <- child(mdiaS, mdiaE, "hdlr")
      if hdlrS + 12 <= hdlrE
    } yield fourcc(hdlrS + 8) == "vide").getOrElse(false)
    try {
      // top level must lead with a well-formed box chain containing ftyp
      if (b.length < 16 || child(0, b.length, "ftyp").isEmpty) return None
      for {
        (moovS, moovE) <- child(0, b.length, "moov")
        traks = children(moovS, moovE, "trak")
        trak <- traks.find((isVideoTrak _).tupled)
          .orElse(traks.find(t => trakDims(t._1, t._2) != ((0, 0))))
      } yield {
        val (trakS, trakE) = trak
        val (w, h) = trakDims(trakS, trakE)
        val frames = (for {
          (mdiaS, mdiaE) <- child(trakS, trakE, "mdia")
          (minfS, minfE) <- child(mdiaS, mdiaE, "minf")
          (stblS, stblE) <- child(minfS, minfE, "stbl")
          (stszS, stszE) <- child(stblS, stblE, "stsz")
          if stszS + 12 <= stszE
        } yield u32(stszS + 8).toInt).getOrElse(1)
        MediaFeatures(a.asset_id, a.kind, b.length.toLong, w, h,
          math.max(frames, 1), sha256Hex(b))
      }
    } catch { case _: Exception => None }
  }

  /** Decode one asset: a REAL javax.imageio decode for recognizable
    * image payloads, a REAL javax.sound header parse for WAV/AIFF/AU
    * audio payloads, and a REAL ISO-14496-12 box walk for MP4/MOV
    * video payloads; a deterministic sha256-derived pseudo-decode for
    * everything else (compressed-audio and non-MP4 video codecs aren't
    * in this container — the fallback keeps every row present and the
    * harness oracles replayable, since the synthetic corpus's UTF-8
    * payloads all take this path). The partitioning, batching and
    * schema contract are identical for all paths. */
  private def decodeOne(a: MediaAsset): MediaFeatures =
    imageDecode(a).orElse(audioDecode(a)).orElse(mp4Decode(a)).getOrElse {
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

  /** 60-bit perceptual dHash per asset
    * ([[graft.functions.ImageDHash]]): real pixel-path hashes for
    * decodable images, the sha256-derived fallback otherwise — one
    * TOTAL fingerprint column, a pure map stage over the payloads. */
  def imageDHashes(assets: Dataset[MediaAsset]): DataFrame =
    assets.toDF().select(col("asset_id"),
      graft.functions.MediaFunctions.image_dhash(col("payload")).as("dhash"))

  /** Perceptual image near-dup pairs: the dHash fingerprints ride the
    * SAME 4×15-bit pigeonhole blocking as the text simhash family
    * ([[graft.dedup.Dedup.simHashNearDupsFromFps]] — exact for
    * `maxHamming ≤ 3`), so a recolored/re-encoded twin pairs with its
    * original without any all-pairs scan. Output (id_a, id_b, hamming),
    * id_a < id_b. */
  def imageNearDups(assets: Dataset[MediaAsset],
      maxHamming: Int = 3): DataFrame =
    graft.dedup.Dedup.simHashNearDupsFromFps(
      imageDHashes(assets).select(col("asset_id"),
        col("dhash").as("simhash")),
      "asset_id", maxHamming)

  val queries: Map[String, Q] = Map(
    // perceptual image fingerprints (r14): pixel-path dHash where a
    // reader decodes, sha256-derived 60-bit fallback elsewhere — on
    // this corpus (text bytes standing in for media) every row takes
    // the fallback, which is exactly what the oracle replays; the
    // pixel path is spec-pinned on real PNG fixtures (recolored twins
    // collide, distinct images don't)
    "q182_image_dhash" -> { (s, d) =>
      imageDHashes(assetsFromDocuments(s, d)).orderBy("asset_id")
    },

    // dHash near-dup pairs, pigeonhole-blocked like simhash; every 50th
    // asset gets a re-keyed byte-identical twin (the corpus's planted
    // text dups are token-level, not byte-level, so without twins the
    // pair set is empty — a 0-row green proves nothing). Oracle is the
    // brute-force O(n²) hamming scan over the same unioned fingerprints.
    "q183_image_near_dups" -> { (s, d) =>
      import s.implicits._
      val base = assetsFromDocuments(s, d)
      val twins = base.toDF().filter(col("asset_id") % 50 === 0)
        .select((col("asset_id") + 100000L).as("asset_id"), col("kind"),
          col("payload"))
        .as[MediaAsset]
      imageNearDups(base.unionByName(twins), maxHamming = 3)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b")
    },

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
    "q182_image_dhash" ->
      """SELECT doc_id AS asset_id,
        |  CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS dhash
        |FROM documents ORDER BY asset_id""".stripMargin,
    "q183_image_near_dups" ->
      """WITH h0 AS (
        |  SELECT doc_id, CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS dh
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (
        |  SELECT doc_id, dh FROM h0
        |  UNION ALL
        |  SELECT doc_id + 100000, dh FROM h0 WHERE doc_id % 50 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
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
