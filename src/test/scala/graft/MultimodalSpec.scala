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

  test("image records get dimensions, time media get durations") {
    val out = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder())
    val img = out.filter($"modality" === "image")
    val av = out.filter($"modality" =!= "image")
    assert(img.filter($"width" <= 0 || $"height" <= 0).count() == 0)
    assert(av.filter($"duration_ms" <= 0).count() == 0)
    assert(img.filter($"duration_ms" =!= 0).count() == 0)
  }
}
