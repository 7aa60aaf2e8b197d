package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (the north-star training-data surface):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed in batched partition-level operators.
  *
  * IMAGE decode and resize are REAL: [[ImageIODecoder]] and [[resize]] run
  * the JDK's built-in `javax.imageio` (PNG/BMP/JPEG/GIF — zero new
  * dependencies) inside the same `mapPartitions` shape, falling back to
  * the deterministic fake for payloads the codec rejects, so a mixed or
  * synthetic corpus still flows end-to-end. AUDIO/VIDEO decode (resampling,
  * frame extraction) needs codecs the JDK does not ship — those stay
  * STUBBED behind [[Decoder]] with a deterministic fake. Everything
  * Spark-side is real and tested: schema, binary column handling, batch
  * shape, partition-level execution (one decoder instance per partition,
  * mirroring how a Pandas-UDF/`mapInPandas` stage batches in PySpark), and
  * partition-count preservation.
  */
object Multimodal {

  // BufferedImage pixel ops never need a display; set headless defensively
  // so executor JVMs without DISPLAY can't trip AWT initialization
  private def ensureHeadless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  /** The wrapping 31-fold over raw bytes — ONE definition for every
    * fallback-hash site (StubDecoder checksum, perceptualHashes,
    * videoFrameHashes): its bit-for-bit behavior is oracle-pinned (the
    * q70 HUGEINT fold contract), so drift between copies would silently
    * break oracle parity.
    */
  private[graft] def byteFold(p: Array[Byte]): Long =
    p.foldLeft(0L)((a, b) => a * 31 + (b & 0xFF))

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      modality: String,      // "image" | "audio" | "video"
      payload: Array[Byte],
      source_uri: String)

  /** Extracted features: fixed-width summary per record. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature: Array[Float])

  /** The decode/feature-extract stage contract. Real implementations wrap
    * libjpeg/ffmpeg/etc; [[StubDecoder]] is the deterministic fake used in
    * this environment.
    */
  trait Decoder extends Serializable {
    def decode(rec: MediaRecord): MediaFeatures
  }

  /** Deterministic fake: derives "dimensions" and a feature vector from the
    * payload bytes alone, so pipelines are testable end-to-end without media
    * libraries. Replace with a real codec in production — the Spark plumbing
    * around it is unchanged.
    */
  final class StubDecoder(featureDim: Int = 8) extends Decoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val bytes = if (rec.payload == null) Array.empty[Byte] else rec.payload
      val n = bytes.length
      val checksum = byteFold(bytes)
      val feats = Array.tabulate(featureDim) { i =>
        // stable per (payload, index) pseudo-feature in [0, 1)
        (((checksum + i * 2654435761L) & 0x7FFFFFFF).toDouble / Int.MaxValue).toFloat
      }
      MediaFeatures(
        media_id = rec.media_id,
        modality = rec.modality,
        n_bytes = n.toLong,
        width = if (rec.modality == "image") 64 + (checksum % 64).toInt.abs else 0,
        height = if (rec.modality == "image") 64 + (checksum % 48).toInt.abs else 0,
        duration_ms = if (rec.modality != "image") 1000L + (checksum % 9000L).abs else 0L,
        feature = feats)
    }
  }

  /** REAL media decode with the JDK's built-in codec family — zero new
    * dependencies:
    *
    *   - IMAGES via `javax.imageio` (PNG, BMP, JPEG, GIF): true
    *     width/height and an 8-dim pixel-statistics feature (mean R/G/B +
    *     mean luminance, normalized to [0,1], then a 4-bin luminance
    *     histogram) — deterministic from pixel content, so downstream
    *     similarity/dedup over the feature column is meaningful.
    *   - AUDIO via `javax.sound.sampled` (WAV/AIFF/AU PCM): true
    *     duration_ms from the frame count / frame rate, and an 8-segment
    *     RMS-energy envelope as the feature — the "waveform thumbnail" an
    *     audio curation pipeline filters on.
    *
    * Payloads the codec rejects (corrupt bytes, unsupported formats, or
    * the synthetic text-byte payloads of the test tables) fall back to the
    * [[StubDecoder]] fake instead of failing the partition — per-row error
    * isolation, the B4 posture (`ingester/annotations_indexer.py:330-340`).
    * True VIDEO codecs remain the one stubbed path (the JDK has none);
    * animated GIFs get real frame extraction via [[sampleFrames]].
    */
  final class ImageIODecoder(featureDim: Int = 8) extends Decoder {
    private val fallback = new StubDecoder(featureDim)
    override def decode(rec: MediaRecord): MediaFeatures = {
      if (rec.payload == null || rec.payload.isEmpty) fallback.decode(rec)
      else if (rec.modality == "audio") {
        decodeAudioFeatures(rec, featureDim).getOrElse(fallback.decode(rec))
      } else if (rec.modality != "image") fallback.decode(rec)
      else decodeImageFeatures(rec)
    }

    private def decodeImageFeatures(rec: MediaRecord): MediaFeatures = {
      val img = decodeImage(rec.payload)
      if (img == null) fallback.decode(rec)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr, sg, sb, sl = 0.0
        val hist = new Array[Double](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            val lum = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += lum
            hist(math.min(3, (lum / 64.0).toInt)) += 1.0
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        val base = Array(sr / n / 255.0, sg / n / 255.0, sb / n / 255.0,
          sl / n / 255.0, hist(0) / n, hist(1) / n, hist(2) / n, hist(3) / n)
        val feats = Array.tabulate(featureDim)(i =>
          if (i < base.length) base(i).toFloat else 0.0f)
        MediaFeatures(rec.media_id, rec.modality, rec.payload.length.toLong,
          w, h, 0L, feats)
      }
    }
  }

  /** Perceptual hash row: `decoded` separates real aHashes from the
    * byte-fold fallback (the two domains never near-collide meaningfully,
    * but a consumer can filter on provenance).
    */
  case class MediaHash(media_id: Long, modality: String, ahash: Long, decoded: Boolean)

  /** 64-bit average hash (aHash): box-downsample the luminance plane to an
    * 8×8 grid (every pixel contributes to exactly one cell, so the hash is
    * resize-stable), then bit i = cell i's mean luminance above the grid
    * mean. The classic image near-dup key: re-encodes, rescales, and small
    * edits move few bits, so Hamming distance is the dedup radius.
    */
  private[graft] def aHashFromImage(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        val c = cy * 8 + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val mean = means.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Per-record perceptual hash: REAL aHash for decodable images
    * (`javax.imageio`), the StubDecoder's wrapping 31-fold over the raw
    * bytes for everything else (audio/video/undecodable) — so exact binary
    * duplicates still collide and the synthetic test corpus (text-byte
    * payloads) stays fully oracle-expressible (the q70 checksum contract).
    * Map-side only; one decode per record.
    */
  def perceptualHashes(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val p = if (rec.payload == null) Array.empty[Byte] else rec.payload
        val img = if (rec.modality == "image" && p.nonEmpty) decodeImage(p) else null
        if (img != null) MediaHash(rec.media_id, rec.modality, aHashFromImage(img), decoded = true)
        else MediaHash(rec.media_id, rec.modality,
          byteFold(p), decoded = false)
      }
    }
  }

  /** 64-bit audio-envelope signature over [[MediaFeatures]] — the audio
    * counterpart of [[aHashFromImage]]: each of the 8 RMS-envelope
    * segments ([[decodeAudioFeatures]]'s feature contract; the
    * StubDecoder fallback keeps the same 8-slot shape) is quantized to a
    * level q = min(7, ⌊f·8⌋) and emitted as a THERMOMETER code — q one
    * bits in the segment's 8-bit lane. Unlike a binary Gray/straight
    * code, thermometer Hamming distance between two signatures is exactly
    * Σ|q_a − q_b| — the L1 distance of the quantized envelopes — so
    * "small Hamming" IS "perceptually close loudness contour", and the
    * pigeonhole band join ([[perceptualPairs]]) applies unchanged.
    * Pure codegen column arithmetic (element_at / floor / shiftleft /
    * bitwise-or) — no UDF, map-side only.
    */
  def audioSignatures(features: Dataset[MediaFeatures]): DataFrame = {
    val sig = (0 until 8).map { s =>
      val q = least(lit(7L),
        floor(element_at(col("feature"), s + 1).cast("double") * lit(8.0))
          .cast("long"))
      // 2^q − 1 = q thermometer ones (pow is exact for q ≤ 7; shiftleft's
      // numBits parameter is Int-only, so the variable shift goes via pow)
      shiftleft(pow(lit(2.0), q).cast("long") - lit(1L), s * 8)
    }.reduce(_ bitwiseOR _)
    features.toDF().select(col("media_id"), col("modality"), sig.as("ahash"))
  }

  /** Hamming-≤k near-dup pairs over a hash column via the pigeonhole band
    * join (the SimHash blocking argument, `Dedup.simhashPairs`): split the
    * 64-bit hash into 4 16-bit bands — any pair within Hamming ≤ 3 agrees
    * EXACTLY on at least one band — equi-join per band, dedup the pair
    * set, verify with one codegen `bit_count(xor)`. Comparison volume is
    * Σ band-bucket², never corpus²; `maxHamming ≤ 3` is a hard require
    * because 4 bands only guarantee completeness to 3 flipped bits.
    * Input should be snapshotted by the caller if its lineage is expensive
    * (the decode stage is) — both join sides reference it.
    */
  def perceptualPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band pigeonhole is complete only to Hamming 3: $maxHamming")
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * 16).bitwiseAND(lit(65535L)).as("bval"))
      }: _*)).as("bb"))
      .select(col("media_id"), col("ahash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-FRAME perceptual hashes for time media ([[sampleFrames]] →
    * aHash): real multi-frame containers (animated GIF, MJPEG-AVI) get
    * true per-frame aHashes (each sampled frame is a decodable PNG);
    * fallback-path frames (unsupported codecs — deterministic byte
    * slices) keep the byte-fold so exact binary duplicates still
    * collide. One row per (media_id, frame_idx).
    */
  def videoFrameHashes(media: Dataset[MediaRecord],
                       everyMs: Long = 500L, maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    sampleFrames(media.filter(_.modality == "video"), everyMs, maxFrames)
      .mapPartitions { it =>
        it.map { f =>
          val p = if (f.frame_payload == null) Array.empty[Byte] else f.frame_payload
          val img = if (p.nonEmpty) decodeImage(p) else null
          val h =
            if (img != null) aHashFromImage(img)
            else byteFold(p)
          (f.media_id, f.frame_idx, h)
        }
      }.toDF("media_id", "frame_idx", "ahash")
  }

  /** Video near-dup pairs: two videos match when ANY sampled frame pair
    * lands within `maxHamming` (the shot-sampling argument — re-encodes
    * and trims keep most sampled frames perceptually close to SOME frame
    * of the source). Reuses [[perceptualPairs]]' pigeonhole band join on
    * the FRAME relation (multiple rows per media_id are exactly the
    * desired multiplicity: every cross-video frame pair in a shared band
    * bucket becomes a candidate), then folds to one row per video pair
    * with the closest frame distance. Σ band-bucket² over frames, never
    * videos² — and frames per video are capped by the sampler.
    */
  def videoPairs(frameHashes: DataFrame, maxHamming: Int = 3): DataFrame =
    perceptualPairs(frameHashes, maxHamming)
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("min_hamming"))

  /** `ImageIO.read` with the failure modes collapsed to null: it returns
    * null for unrecognized formats and throws IOException for recognized-
    * but-corrupt streams — a per-row decode failure either way.
    */
  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    ensureHeadless()
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException => null }
  }

  /** Real PCM audio decode (`javax.sound.sampled` — WAV/AIFF/AU):
    * duration_ms from frame length / frame rate, feature = per-segment RMS
    * energy over `featureDim` equal time slices (signed 16/8-bit PCM,
    * first channel), normalized to [0, 1]. None when the payload is not a
    * recognized audio stream or uses an unsupported encoding.
    */
  private def decodeAudioFeatures(rec: MediaRecord, featureDim: Int): Option[MediaFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(rec.payload)))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames <= 0 || fmt.getFrameRate <= 0 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            (fmt.getSampleSizeInBits != 16 && fmt.getSampleSizeInBits != 8)) None
        else {
          val durationMs = (frames * 1000.0 / fmt.getFrameRate).toLong
          val bytes = in.readAllBytes()
          val frameSize = fmt.getFrameSize
          val nFrames = bytes.length / frameSize
          val sumsq = new Array[Double](featureDim)
          val counts = new Array[Long](featureDim)
          val big = fmt.isBigEndian
          var f = 0
          while (f < nFrames) {
            val seg = math.min(featureDim - 1, (f.toLong * featureDim / nFrames).toInt)
            val off = f * frameSize // first channel only
            val sample =
              if (fmt.getSampleSizeInBits == 16) {
                val lo = bytes(off + (if (big) 1 else 0)) & 0xFF
                val hi = bytes(off + (if (big) 0 else 1))
                ((hi << 8) | lo).toShort.toDouble / 32768.0
              } else bytes(off).toDouble / 128.0
            sumsq(seg) += sample * sample
            counts(seg) += 1
            f += 1
          }
          val feats = Array.tabulate(featureDim)(i =>
            if (counts(i) == 0) 0.0f
            else math.sqrt(sumsq(i) / counts(i)).toFloat)
          Some(MediaFeatures(rec.media_id, rec.modality,
            rec.payload.length.toLong, 0, 0, durationMs, feats))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** The operator: partition-level decode. One Decoder per partition (codec
    * init is expensive — same reason the reference pools one HTTP session
    * per worker), rows streamed through it lazily, no per-row setup.
    */
  def extractFeatures(media: Dataset[MediaRecord], mkDecoder: () => Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = mkDecoder()
      it.map(decoder.decode)
    }
  }

  /** Resize stage (images). REAL for decodable payloads: `javax.imageio`
    * decode → bilinear `Graphics2D` scale to exactly `w`×`h` → PNG
    * re-encode (lossless, JDK-builtin — the one format ImageIO always
    * writes). Payloads the codec rejects keep the deterministic fake
    * (payload re-sampled proportionally) so synthetic corpora still flow;
    * both paths tag `source_uri` with the `?resized=WxH` marker.
    * Non-images pass through untouched.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = if (r.payload == null) Array.empty[Byte] else r.payload
        if (r.modality != "image" || p.isEmpty) r
        else {
          val img = decodeImage(p)
          val resized =
            if (img != null) reencodePng(scaleBilinear(img, w, h))
            else {
              val target = math.max(1, (w * h) / 64)
              Array.tabulate(target)(i => p(i % p.length))
            }
          r.copy(payload = resized, source_uri = r.source_uri + s"?resized=${w}x$h")
        }
      }
    }
  }

  private def scaleBilinear(img: java.awt.image.BufferedImage,
                            w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  private def reencodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling (video/audio): one row per sampled frame — the
    * explode-shaped stage. REAL for multi-frame media the JDK can decode:
    * animated GIF via `ImageIO`'s multi-image reader, and MJPEG-in-AVI via
    * the RIFF chunk walker below (each `..dc`/`..db` movi chunk is a
    * standalone JPEG the JDK decodes natively). Frames are evenly strided
    * down to `maxFrames`, each re-encoded as a standalone PNG (offset_ms =
    * stride index × everyMs; container timing metadata is deliberately not
    * parsed — sampling is by position, and the paced variant would need
    * the same dataflow). Other video containers (no JDK codec) keep the
    * deterministic byte-slice fake.
    */
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, frame_payload: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long, maxFrames: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality != "image").flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      decodeGifFrames(p, maxFrames)
        .orElse(decodeMjpegAviFrames(p, maxFrames)) match {
        case Some(frames) =>
          frames.zipWithIndex.map { case (png, i) =>
            Frame(r.media_id, i, i * everyMs, png)
          }
        case None =>
          val durationMs = 1000L + (p.length % 9000)
          val n = math.min(maxFrames, math.max(1, (durationMs / everyMs).toInt))
          (0 until n).map { i =>
            val off = i * everyMs
            val slice = p.slice((i * 7) % math.max(1, p.length),
              math.min(p.length, (i * 7) % math.max(1, p.length) + 16))
            Frame(r.media_id, i, off, slice)
          }
      }
    }
  }

  /** MJPEG/AVI frame extraction — a real video container without needing a
    * video codec: AVI is RIFF (`RIFF<size>AVI ` then fourcc+size chunks,
    * `LIST` chunks nesting via a 4-byte list type), and an MJPEG stream's
    * frame chunks (`NNdc`/`NNdb` inside the `movi` list, possibly grouped
    * in `rec ` sub-lists) are each a standalone JPEG — which `ImageIO`
    * decodes natively. Walk the chunk tree, collect the frame chunks,
    * evenly stride to `maxFrames`, re-encode PNG (the same output contract
    * as the GIF path). None for non-AVI payloads, AVIs whose frames the
    * JPEG codec rejects (a non-MJPEG AVI), or fewer than 2 frames; any
    * parse failure falls back per-row (NonFatal, as everywhere in this
    * file).
    */
  private def decodeMjpegAviFrames(
      payload: Array[Byte], maxFrames: Int): Option[Seq[Array[Byte]]] = {
    def fourcc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      java.nio.ByteBuffer.wrap(payload, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    if (payload.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    ensureHeadless()
    try {
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // walk chunks in [from, until); recurse into LIST bodies. All
      // position arithmetic in LONG: a malformed size field near 2^32
      // would otherwise truncate negative in Int and stall the walk —
      // and a loop, unlike an exception, is not caught by NonFatal
      def walk(from: Int, until: Int): Unit = {
        var pos = from.toLong
        while (pos + 8 <= until) {
          val id = fourcc(pos.toInt)
          val size = u32(pos.toInt + 4)
          val dataStart = pos + 8
          val dataEnd = math.min(until.toLong, dataStart + size).toInt
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(dataStart.toInt)
            if (listType == "movi" || listType == "rec ")
              walk(dataStart.toInt + 4, dataEnd)
          } else if (id.length == 4 && id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
              && size > 0) {
            frames += ((dataStart.toInt, dataEnd))
          }
          val next = dataStart + size + (size & 1L) // chunks pad to even
          if (next <= pos) return // malformed size: refuse to spin, fall back
          pos = next
        }
      }
      walk(12, payload.length)
      if (frames.length < 2) return None
      val take = math.min(maxFrames, frames.length)
      val idxs = (0 until take).map(i => i * frames.length / take)
      val decoded = idxs.map { i =>
        val (s, e) = frames(i)
        decodeImage(java.util.Arrays.copyOfRange(payload, s, e))
      }
      // all-or-nothing: a partially decodable AVI is not MJPEG — fake it
      if (decoded.exists(_ == null)) None
      else Some(decoded.map(reencodePng))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Animated-GIF frame extraction via `ImageIO`'s multi-image reader:
    * Some(≤ maxFrames PNG-encoded frames, evenly strided) when the payload
    * is a multi-frame GIF; None otherwise (single-frame images included —
    * a still has no frames to sample).
    */
  private def decodeGifFrames(payload: Array[Byte], maxFrames: Int): Option[Seq[Array[Byte]]] = {
    if (payload.length < 6 || payload(0) != 'G' || payload(1) != 'I' || payload(2) != 'F')
      return None
    ensureHeadless()
    // createImageInputStream may return NULL (no usable stream SPI/cache
    // dir) rather than throw, and getImageReaders(null) then throws IAE —
    // null-check and catch NonFatal so any per-row decode failure takes the
    // documented byte-slice fallback instead of failing the partition.
    val iis = try javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => return None }
    if (iis == null) return None
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true) // allowSearch: count frames
      if (n < 2) None
      else {
        val take = math.min(maxFrames, n)
        // even stride over the full animation, first frame always included
        val idxs = (0 until take).map(i => i * n / take)
        Some(idxs.map(i => reencodePng(reader.read(i))))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally { reader.dispose(); iis.close() }
  }

  /** Build a deterministic media table from the `documents` test table:
    * payload = UTF-8 bytes of the text, modality round-robined. Stands in
    * for a real binary-column source (parquet holds it as BINARY either way).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("synthetic://docs/"), col("doc_id")).as("source_uri"))
      .as[MediaRecord]
  }

  /** [[mediaFromDocuments]] plus PLANTED DUPLICATES: every `every`-th
    * document contributes a second record (`media_id + idOffset`, same
    * payload and modality) — the deterministic stand-in for the
    * re-uploaded / re-crawled binary assets a real corpus is full of, so
    * the perceptual near-dup queries (q150/q180) exercise non-empty true
    * pair sets at every SF instead of matching on emptiness. Payload
    * equality ⇒ hash equality on both the aHash and byte-fold paths, so
    * each clone pairs with its source at Hamming 0.
    */
  def mediaWithClones(spark: SparkSession, docs: DataFrame,
                      every: Int = 100, idOffset: Long = 1000000L): Dataset[MediaRecord] = {
    import spark.implicits._
    // id-namespace guard: a doc_id at or above the offset would collide
    // with a clone id and silently merge two distinct records (one
    // column-pruned max scan — this is a fixture builder, not a hot path)
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(-1L))).head().getLong(0)
    require(maxId < idOffset,
      s"doc_id $maxId collides with the clone id namespace (offset $idOffset)")
    val base = mediaFromDocuments(spark, docs)
    val clones = mediaFromDocuments(spark, docs.filter(col("doc_id") % every === 0))
      .withColumn("media_id", col("media_id") + idOffset)
      .withColumn("source_uri", concat(col("source_uri"), lit("?clone=1")))
      .as[MediaRecord]
    base.union(clones)
  }
}
