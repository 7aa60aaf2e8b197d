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

  /** A real PNG, generated with the same JDK codec the decoder reads with:
    * solid `rgb` fill so the expected pixel statistics are exact.
    */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Half-split luminance pattern at any size (cell grid aligns with the
    * split for sizes divisible by 8, so the aHash is size-invariant).
    */
  private def patternPng(size: Int, invert: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val bright = (x >= size / 2) ^ invert
      val v = if (bright) 230 else 20
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash: real PNGs resize-stable, inverted image far, byte-fold fallback; pairs block correctly") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", patternPng(64, invert = false), "a"),
      Multimodal.MediaRecord(2L, "image", patternPng(96, invert = false), "b"),
      Multimodal.MediaRecord(3L, "image", patternPng(64, invert = true), "c"),
      Multimodal.MediaRecord(4L, "image", "not an image at all".getBytes("UTF-8"), "d"))
    val hs = Multimodal.perceptualHashes(recs.toDS())
      .collect().map(h => h.media_id -> h).toMap
    assert(hs(1L).decoded && hs(2L).decoded && hs(3L).decoded)
    assert(!hs(4L).decoded)
    // same pattern at 64 vs 96 px → identical hash (grid aligns with split)
    assert(java.lang.Long.bitCount(hs(1L).ahash ^ hs(2L).ahash) <= 3)
    // inverted pattern → complement hash, maximal distance
    assert(java.lang.Long.bitCount(hs(1L).ahash ^ hs(3L).ahash) > 32)
    // fallback = the StubDecoder byte fold
    val expectFold = "not an image at all".getBytes("UTF-8")
      .foldLeft(0L)((a, b) => a * 31 + (b & 0xFF))
    assert(hs(4L).ahash == expectFold)
    // band-blocked pairing finds the near-dup pair and nothing else
    val hdf = Multimodal.perceptualHashes(recs.toDS()).toDF()
    val pairs = Multimodal.perceptualPairs(hdf, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("ImageIODecoder really decodes a PNG: true dimensions and exact pixel stats") {
    val red = Multimodal.MediaRecord(1L, "image", pngBytes(6, 4, 0xFF0000), "u")
    val text = Multimodal.MediaRecord(2L, "image", "not an image".getBytes, "u")
    val out = Multimodal.extractFeatures(
        Seq(red, text).toDS().repartition(2), () => new Multimodal.ImageIODecoder())
      .collect().map(f => f.media_id -> f).toMap
    val r = out(1L)
    assert(r.width == 6 && r.height == 4, "true PNG dimensions, not the stub's fake")
    assert(r.feature(0) == 1.0f, "mean R of a solid-red image")
    assert(r.feature(1) == 0.0f && r.feature(2) == 0.0f)
    assert(math.abs(r.feature(3) - 0.299f) < 1e-3, "mean luminance of pure red")
    // red's luminance 76.2 lands in histogram bin 1 for every pixel
    assert(r.feature(4) == 0.0f && r.feature(5) == 1.0f)
    // the non-decodable payload falls back to the stub, doesn't fail the partition
    val t = out(2L)
    assert(t.width >= 64, "stub fallback dimensions")
  }

  test("resize really rescales a decodable PNG (decode-verified), fake-path otherwise") {
    val real = Multimodal.MediaRecord(1L, "image", pngBytes(8, 8, 0x0000FF), "u1")
    val fake = Multimodal.MediaRecord(2L, "image", "plain bytes".getBytes, "u2")
    val out = Multimodal.resize(Seq(real, fake).toDS(), 4, 4)
      .collect().map(r => r.media_id -> r).toMap
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).payload))
    assert(back.getWidth == 4 && back.getHeight == 4, "re-encoded PNG has target dims")
    assert((back.getRGB(2, 2) & 0xFFFFFF) == 0x0000FF,
      "bilinear scale of a solid color preserves the color")
    assert(out(1L).source_uri.endsWith("?resized=4x4"))
    assert(out(2L).payload.length == math.max(4 * 4 / 64, 1),
      "non-decodable keeps the fake path")
    assert(out(2L).source_uri.endsWith("?resized=4x4"))
  }

  test("ImageIODecoder really decodes WAV audio: true duration and RMS envelope") {
    // 500 ms of 16-bit mono PCM at 8 kHz: first half silence, second half
    // a ±0.5 full-scale square wave → RMS envelope 0 ... 0.5 by segment
    val rate = 8000
    val n = rate / 2
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if (i % 8 < 4) 16384 else -16384
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rec = Multimodal.MediaRecord(1L, "audio", bos.toByteArray, "u")
    val junk = Multimodal.MediaRecord(2L, "audio", "not audio".getBytes, "u")
    val out = Multimodal.extractFeatures(
        Seq(rec, junk).toDS(), () => new Multimodal.ImageIODecoder())
      .collect().map(f => f.media_id -> f).toMap
    val a = out(1L)
    assert(a.duration_ms == 500L, s"true PCM duration, got ${a.duration_ms}")
    assert(a.feature(0) == 0.0f && a.feature(3) == 0.0f, "silent first half")
    assert(math.abs(a.feature(4) - 0.5f) < 0.01f &&
           math.abs(a.feature(7) - 0.5f) < 0.01f, "square-wave RMS = amplitude")
    // non-audio bytes fall back to the stub (fake nonzero duration, and
    // the real path's duration above came from the PCM header instead)
    assert(out(2L).duration_ms >= 1000L)
  }

  test("sampleFrames really extracts animated-GIF frames (decode-verified), fake path otherwise") {
    // 5-frame animated GIF, frame i = solid gray level i*50
    val ios = new java.io.ByteArrayOutputStream()
    val imgOut = javax.imageio.ImageIO.createImageOutputStream(ios)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(imgOut)
    writer.prepareWriteSequence(null)
    for (i <- 0 until 5) {
      val img = new java.awt.image.BufferedImage(
        6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (i * 50) << 16 | (i * 50) << 8 | (i * 50)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, g)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); writer.dispose(); imgOut.close()
    val gif = Multimodal.MediaRecord(1L, "video", ios.toByteArray, "u1")
    val blob = Multimodal.MediaRecord(2L, "video", "opaque video bytes".getBytes, "u2")
    val frames = Multimodal.sampleFrames(
        Seq(gif, blob).toDS(), everyMs = 100, maxFrames = 3)
      .collect().groupBy(_.media_id)
    // real path: 3 of 5 frames, evenly strided (0, 1, 3), PNG re-encoded
    val real = frames(1L).sortBy(_.frame_idx)
    assert(real.length == 3)
    val f0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real(0).frame_payload))
    assert(f0.getWidth == 6 && f0.getHeight == 4, "decoded frame keeps GIF dims")
    assert((f0.getRGB(1, 1) & 0xFF) == 0, "frame 0 is the black frame")
    val fLast = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real(2).frame_payload))
    assert((fLast.getRGB(1, 1) & 0xFF) > 0, "later frames carry later content")
    // fake path: still produces deterministic slices for opaque payloads
    assert(frames(2L).nonEmpty)
    assert(frames(2L).forall(_.frame_payload.length <= 16))
  }

  test("sampleFrames really extracts MJPEG-AVI frames via the RIFF walker") {
    // hand-build a minimal MJPEG AVI: RIFF("AVI ") { LIST("hdrl"){avih},
    // LIST("movi"){ 00dc=jpeg ×5, plus one frame nested in a rec list } }
    def jpegBytes(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = gray << 16 | gray << 8 | gray
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, g)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array() // trailing pad byte (if any) stays 0, per RIFF
    }
    def list(listType: String, children: Array[Byte]*): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children.flatten)
    val frames = (0 until 5).map(i => jpegBytes(i * 50))
    val movi = list("movi",
      (frames.take(4).map(chunk("00dc", _)) :+
        list("rec ", chunk("00dc", frames(4)))): _*)
    val hdrl = list("hdrl", chunk("avih", Array.fill[Byte](56)(0)))
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)

    val rec = Multimodal.MediaRecord(1L, "video", avi, "u1")
    val blob = Multimodal.MediaRecord(2L, "video", "RIFFxxxxWAVE not avi".getBytes, "u2")
    val out = Multimodal.sampleFrames(
        Seq(rec, blob).toDS(), everyMs = 100, maxFrames = 3)
      .collect().groupBy(_.media_id)
    // real path: 3 of 5 frames (indices 0, 1, 3), including the rec-nested
    // fifth frame in the frame census, PNG re-encoded with true dims
    val real = out(1L).sortBy(_.frame_idx)
    assert(real.length == 3, s"expected 3 sampled frames, got ${real.length}")
    val f0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real(0).frame_payload))
    assert(f0.getWidth == 6 && f0.getHeight == 4, "decoded frame keeps AVI dims")
    assert((f0.getRGB(1, 1) & 0xFF) < 20, "frame 0 is the near-black frame")
    val fLast = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real(2).frame_payload))
    assert((fLast.getRGB(1, 1) & 0xFF) > 60, "later frames carry later content")
    // a RIFF that is not an AVI stays on the deterministic fake path
    assert(out(2L).nonEmpty && out(2L).forall(_.frame_payload.length <= 16))
  }

  test("RIFF walker tolerates malformed chunk sizes: terminates and takes the fake path") {
    // an "AVI" whose single movi chunk declares a ~4 GiB size (0xFFFFFFF0)
    // over 16 real bytes — the Int-truncation hazard class; the walker
    // must finish (Long arithmetic + monotonic-advance guard) and the
    // record must fall back to the deterministic byte-slice frames
    val bb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40).put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(28).put("movi".getBytes("US-ASCII"))
    bb.put("00dc".getBytes("US-ASCII")).putInt(0xFFFFFFF0).put(Array.fill[Byte](16)(7))
    val rec = Multimodal.MediaRecord(1L, "video", bb.array(), "u")
    val out = Multimodal.sampleFrames(Seq(rec).toDS(), everyMs = 100, maxFrames = 3).collect()
    assert(out.nonEmpty && out.forall(_.frame_payload.length <= 16),
      "malformed AVI must land on the deterministic fallback")
  }

  test("image records get dimensions, time media get durations") {
    val out = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder())
    val img = out.filter($"modality" === "image")
    val av = out.filter($"modality" =!= "image")
    assert(img.filter($"width" <= 0 || $"height" <= 0).count() == 0)
    assert(av.filter($"duration_ms" <= 0).count() == 0)
    assert(img.filter($"duration_ms" =!= 0).count() == 0)
  }

  test("video near-dup end-to-end on REAL MJPEG AVIs: brightness re-encode pairs, inverted apart") {
    // half-black/half-white frames: aHash = one half's bits, stable under
    // JPEG noise; a global brightness change is aHash-INVARIANT (the hash
    // is mean-relative), an inversion flips every bit
    def frameJpeg(invert: Boolean, hi: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val white = (x >= 8) ^ invert
        val g = if (white) hi else 0
        img.setRGB(x, y, g << 16 | g << 8 | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = chunk("LIST",
        "movi".getBytes("US-ASCII") ++ frames.flatMap(chunk("00dc", _)))
      chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", avi(Seq.fill(3)(frameJpeg(false, 255))), "a"),
      Multimodal.MediaRecord(2L, "video", avi(Seq.fill(3)(frameJpeg(false, 230))), "b"),
      Multimodal.MediaRecord(3L, "video", avi(Seq.fill(3)(frameJpeg(true, 255))), "c")).toDS()
    val fh = Multimodal.videoFrameHashes(recs, everyMs = 100, maxFrames = 4)
    val rows = fh.collect()
    assert(rows.length == 9, s"3 real frames per AVI: ${rows.toSeq}")
    val pairs = Multimodal.videoPairs(fh, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"only the brightness re-encode may pair: ${pairs.toSeq}")
    assert(pairs.head._3 == 0L, "aHash is mean-relative: global brightness is invariant")
  }

  /** 1 s of 16-bit mono PCM at 8 kHz as a WAV, segment s of 8 holding a
    * square wave of amplitude `amps(s)` (fraction of full scale) — the
    * same seg = i·8/n slicing [[Multimodal]]'s decoder uses, so each
    * segment's RMS is exactly its amplitude.
    */
  private def envelopeWav(amps: Array[Double]): Array[Byte] = {
    val rate = 8000
    val n = rate
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val seg = math.min(7, i * 8 / n)
      val mag = (amps(seg) * 32768.0).toInt.min(32767)
      val v: Short = (if (i % 8 < 4) mag else -mag).toShort
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio near-dup end-to-end on REAL WAVs: perturbed envelope pairs, reversed contour apart") {
    // mid-level amplitudes keep every quantizer input far from a q
    // boundary (a*8 ≈ x.5), so small RMS estimation error cannot flip bits
    val ampsA = Array(0.06, 0.19, 0.31, 0.44, 0.56, 0.69, 0.81, 0.94)
    val ampsB = ampsA.clone() // two segments one level up → Hamming exactly 2
    ampsB(0) = 0.19
    ampsB(4) = 0.69
    val ampsC = ampsA.reverse // contour-reversed: L1 of levels = 32
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", envelopeWav(ampsA), "a"),
      Multimodal.MediaRecord(2L, "audio", envelopeWav(ampsB), "b"),
      Multimodal.MediaRecord(3L, "audio", envelopeWav(ampsC), "c")).toDS()
    val feats = Multimodal.extractFeatures(recs, () => new Multimodal.ImageIODecoder())
    val sigs = Multimodal.audioSignatures(feats)
    val pairs = Multimodal.perceptualPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"only the perturbed twin may pair: ${pairs.toSeq}")
    // thermometer code: Hamming IS the L1 distance of quantized envelopes
    assert(pairs.head._3 == 2L, s"two one-level bumps = Hamming 2: ${pairs.toSeq}")
  }

  test("mediaWithClones plants exact duplicates that pair at Hamming 0 for every 100th doc") {
    val docs = Tables.documents(spark, sfDir)
    val withClones = Multimodal.mediaWithClones(spark, docs)
    val expected = docs.filter($"doc_id" % 100 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "fixture must contain clone sources")
    assert(withClones.count() == media.count() + expected.size)
    val hashes = graft.operators.Stage.snapshotDF(
      Multimodal.perceptualHashes(withClones).toDF())
    val pairs = Multimodal.perceptualPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    expected.foreach { d =>
      assert(pairs.contains((d, d + 1000000L, 0L)),
        s"clone of $d must pair with its source at Hamming 0")
    }
  }
}
