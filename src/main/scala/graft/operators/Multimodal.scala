package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (the north-star training-data surface):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed in batched partition-level operators.
  *
  * The actual media decoding (JPEG decode, resampling, frame extraction)
  * needs native libraries that are NOT in this environment — those steps are
  * STUBBED behind [[Decoder]] with a deterministic fake. Everything
  * Spark-side is real and tested: schema, binary column handling, batch
  * shape, partition-level execution (one decoder instance per partition,
  * mirroring how a Pandas-UDF/`mapInPandas` stage batches in PySpark), and
  * partition-count preservation.
  */
object Multimodal {

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

  /** Resize stage (images): STUB — real codecs swap in behind the same
    * signature. Deterministic fake: payload truncated/padded proportionally;
    * metadata updated. The Spark plumbing (partition-level batch, schema
    * preservation) is the real part.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = if (r.payload == null) Array.empty[Byte] else r.payload
        if (r.modality != "image" || p.isEmpty) r
        else {
          val target = math.max(1, (w * h) / 64)
          val resized = Array.tabulate(target)(i => p(i % p.length))
          r.copy(payload = resized, source_uri = r.source_uri + s"?resized=${w}x$h")
        }
      }
    }
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
