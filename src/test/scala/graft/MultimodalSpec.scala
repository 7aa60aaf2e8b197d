package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))

  test("media table has a real BINARY payload column with typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("modality").dataType.typeName == "string")
    val row = media.head()
    assert(row.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(row.modality))
  }

  test("binary columns round-trip through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    media.limit(20).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.count() == 20)
  }

  test("feature extraction is deterministic, total, and schema-stable") {
    val f1 = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder())
    val f2 = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder())
    assert(f1.count() == media.count())
    val a = f1.orderBy("media_id").collect().map(r => (r.media_id, r.feature.toSeq))
    val b = f2.orderBy("media_id").collect().map(r => (r.media_id, r.feature.toSeq))
    assert(a.toSeq == b.toSeq)
    val feats = f1.head()
    assert(feats.feature.length == 8)
    assert(feats.feature.forall(v => v >= 0f && v < 1f))
  }

  test("decode runs per-partition and preserves partitioning (no shuffle)") {
    val repart = media.repartition(7)
    val out = Multimodal.extractFeatures(repart, () => new Multimodal.StubDecoder())
    assert(out.rdd.getNumPartitions == 7)
    // modality metadata drives branch logic in the stub
    val byMod = out.groupBy("modality").agg(count(lit(1))).count()
    assert(byMod == 3)
  }

  test("resize touches only images and preserves record count") {
    val out = Multimodal.resize(media, 32, 32)
    assert(out.count() == media.count())
    val img = out.filter($"modality" === "image").head()
    assert(img.source_uri.endsWith("?resized=32x32"))
    assert(img.payload.length == 32 * 32 / 64)
    val audio = out.filter($"modality" === "audio").head()
    assert(!audio.source_uri.contains("resized"))
  }

  test("resize tolerates empty and null payloads (passthrough, no crash)") {
    val weird = Seq(
      Multimodal.MediaRecord(1L, "image", Array.empty[Byte], "u1"),
      Multimodal.MediaRecord(2L, "image", null, "u2")).toDS()
    val out = Multimodal.resize(weird, 16, 16).collect()
    assert(out.length == 2)
    assert(out.forall(r => !r.source_uri.contains("resized")))
  }

  test("frame sampling explodes time-media into deterministic frame rows") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500, maxFrames = 4)
    assert(frames.filter($"frame_idx" >= 4).count() == 0)
    val perMedia = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
    assert(perMedia.filter($"n" < 1).count() == 0)
    val f1 = frames.orderBy("media_id", "frame_idx").collect()
    val f2 = Multimodal.sampleFrames(media, everyMs = 500, maxFrames = 4)
      .orderBy("media_id", "frame_idx").collect()
    assert(f1.map(_.offset_ms).toSeq == f2.map(_.offset_ms).toSeq)
    assert(f1.map(_.frame_payload.toSeq).toSeq == f2.map(_.frame_payload.toSeq).toSeq)
  }

  test("image records get dimensions, time media get durations") {
    val out = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder())
    val img = out.filter($"modality" === "image")
    val av = out.filter($"modality" =!= "image")
    assert(img.filter($"width" <= 0 || $"height" <= 0).count() == 0)
    assert(av.filter($"duration_ms" <= 0).count() == 0)
    assert(img.filter($"duration_ms" =!= 0).count() == 0)
  }
}
