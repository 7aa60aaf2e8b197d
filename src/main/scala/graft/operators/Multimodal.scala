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
      val checksum = bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xFF))
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

  /** REAL image decode via `javax.imageio` (JDK-builtin: PNG, BMP, JPEG,
    * GIF). A decodable image payload reports its true width/height and an
    * 8-dim pixel-statistics feature vector (mean R/G/B + mean luminance,
    * normalized to [0,1], then a 4-bin luminance histogram) — deterministic
    * from pixel content, so downstream similarity/dedup over the feature
    * column is meaningful. Payloads the codec rejects (corrupt bytes, or
    * the synthetic text-byte payloads of the test tables) fall back to the
    * [[StubDecoder]] fake instead of failing the partition — per-row error
    * isolation, the B4 posture (`ingester/annotations_indexer.py:330-340`).
    * Audio/video still route to the fallback (no JDK codec).
    */
  final class ImageIODecoder(featureDim: Int = 8) extends Decoder {
    private val fallback = new StubDecoder(featureDim)
    override def decode(rec: MediaRecord): MediaFeatures = {
      val img =
        if (rec.modality != "image" || rec.payload == null || rec.payload.isEmpty) null
        else decodeImage(rec.payload)
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

  /** `ImageIO.read` with the failure modes collapsed to null: it returns
    * null for unrecognized formats and throws IOException for recognized-
    * but-corrupt streams — a per-row decode failure either way.
    */
  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    ensureHeadless()
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException => null }
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
    * explode-shaped stage. STUB frame extraction (deterministic byte
    * slices); real decoders keep the same (media → frames) dataflow.
    */
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, frame_payload: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long, maxFrames: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality != "image").flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
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
}
