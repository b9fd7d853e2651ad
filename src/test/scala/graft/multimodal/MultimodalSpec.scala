package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures: deterministic per-partition batch decode over binary payloads") {
    val df = Seq((1L, "image content bytes"), (2L, "other payload")).toDF("id", "text")
    val media = Multimodal.fromText(df, "id", "text", kind = "image")
    val feats1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val feats2 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats1.map(_.digest).sameElements(feats2.map(_.digest)))
    assert(feats1(0).n_bytes == "image content bytes".length)
    assert(feats1.forall(f => f.feature.length == 8 && f.width >= 1 && f.height >= 0))
  }

  test("decodeFeaturesBatched: batch boundaries don't change results (mapInPandas-shape)") {
    val df = (1L to 25L).map(i => (i, s"payload-$i")).toDF("id", "text")
    val media = Multimodal.fromText(df, "id", "text", "image").repartition(2)
    val plain = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    // batchSize 4 forces multiple partial batches + a ragged tail per partition
    val batched = Multimodal.decodeFeaturesBatched(media, batchSize = 4)
      .collect().sortBy(_.media_id)
    assert(batched.length == 25)
    assert(batched.map(f => (f.media_id, f.digest, f.width))
      .sameElements(plain.map(f => (f.media_id, f.digest, f.width))))
  }

  test("resize caps width and keeps aspect; no-op below the cap") {
    val df = Seq((1L, "a-very-wide-image-payload")).toDF("id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.fromText(df, "id", "text", "image"))
    val resized = Multimodal.resize(feats, maxWidth = 320).collect()(0)
    assert(resized.width <= 320 && resized.height == (resized.width * 9) / 16 ||
      resized.width == feats.collect()(0).width)
  }

  test("sampleFrames fans one payload into n evenly spaced typed frames") {
    val df = Seq((7L, "video-bytes")).toDF("id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(df, "id", "text", "video"), n = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.offset_ms).sameElements(Array(0L, 15000L, 30000L, 45000L)))
    assert(frames.map(_.digest).distinct.length == 4) // per-frame digests differ
    assert(frames.forall(_.media_id == 7L))
  }

  test("imageDecode: a real checked-in PNG yields true dims + luminance histogram") {
    // 8x5 PNG: 16 black px (bin 0), 16 white px (bin 7), one 8-px red row
    // (lum 76 -> bin 2) — generated deterministically, checked in
    val png = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/tiny.png").getPath))
    val media = Seq(Multimodal.MediaRow(1L, "image", png)).toDS()
    val f = Multimodal.decodeFeatures(media).collect()(0)
    assert(f.width == 8 && f.height == 5)
    assert(f.n_bytes == png.length)
    assert(math.abs(f.feature.sum - 1f) < 1e-6) // histogram normalizes
    assert(math.abs(f.feature(0) - 0.4f) < 1e-6) // black
    assert(math.abs(f.feature(2) - 0.2f) < 1e-6) // red row
    assert(math.abs(f.feature(7) - 0.4f) < 1e-6) // white
    // the stand-in never produces these dims from this payload: the real
    // codec ran. Non-image bytes under the same kind still route to the
    // stand-in (q28/q81's text-derived payloads are unchanged).
    val fake = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(2L, "image", "not a png".getBytes)).toDS()).collect()(0)
    assert(fake.height == (fake.width * 9) / 16) // stand-in's synthetic aspect
  }

  test("resizeImages: real downscale re-encodes at target width; pass-through otherwise") {
    val png = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/tiny.png").getPath))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),            // 8x5 → shrink to 4-wide
      Multimodal.MediaRow(2L, "image", "junk".getBytes), // undecodable → untouched
      Multimodal.MediaRow(3L, "audio", png)).toDS()      // wrong kind → untouched
    val out = Multimodal.resizeImages(media, maxWidth = 4)
      .collect().sortBy(_.media_id)
    val resized = Multimodal.imageDecode(out(0))
    assert(resized.width == 4 && resized.height == 2) // 5*4/8 = 2, aspect kept
    assert(!out(0).payload.sameElements(png)) // actually re-encoded
    assert(out(1).payload.sameElements("junk".getBytes))
    assert(out(2).payload.sameElements(png))
    // already narrow enough → byte-identical, not re-encoded
    val same = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(4L, "image", png)).toDS(), maxWidth = 8).collect()(0)
    assert(same.payload.sameElements(png))
  }

  test("audioDecode: a real in-memory PCM WAV yields true duration + RMS profile") {
    // canonical 44-byte WAV header, 16-bit mono 8000 Hz, 4000 samples
    // (500 ms): first half silence, second half constant 16384
    val nSamples = 4000
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    (0 until nSamples).foreach(i => bb.putShort(if (i < nSamples / 2) 0 else 16384))
    val wav = bb.array()
    val f = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(9L, "audio", wav)).toDS()).collect()(0)
    assert(f.duration_ms == 500L)
    assert(f.width == 0 && f.height == 0)
    (0 until 4).foreach(i => assert(f.feature(i) == 0f, s"bin $i"))
    (4 until 8).foreach(i =>
      assert(math.abs(f.feature(i) - 16384f / Short.MaxValue) < 1e-4, s"bin $i"))
    // non-WAV bytes under the audio kind still route to the stand-in
    val fake = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(10L, "audio", "not a wav".getBytes)).toDS()).collect()(0)
    assert(fake.height == (fake.width * 9) / 16)
  }

  test("audio kind gets a duration; image does not") {
    val df = Seq((1L, "wavbytes")).toDF("id", "text")
    val img = Multimodal.decodeFeatures(Multimodal.fromText(df, "id", "text", "image")).collect()(0)
    val aud = Multimodal.decodeFeatures(Multimodal.fromText(df, "id", "text", "audio")).collect()(0)
    assert(img.duration_ms == 0L)
    assert(aud.duration_ms >= 0L && img.digest == aud.digest)
  }

  // ---- real MJPEG-AVI video path -------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** Spec-conformant minimal MJPEG-AVI: RIFF('AVI ') → LIST(hdrl, avih)
    * → LIST(movi, 00dc…). */
  private def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Int): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("videoDecode: a real in-memory MJPEG-AVI yields true dims + duration") {
    val frames = Seq(0x000000, 0x808080, 0xFFFFFF, 0x404040)
      .map(jpegFrame(8, 6, _))
    val avi = buildAvi(frames, w = 8, h = 6, usPerFrame = 40000) // 25 fps
    val f = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(20L, "video", avi)).toDS()).collect()(0)
    assert(f.width == 8 && f.height == 6)
    assert(f.duration_ms == 160L) // 4 frames x 40 ms
    assert(math.abs(f.feature.sum - 1f) < 1e-4) // first-frame histogram
    // corrupt container falls back to the stand-in, never throws
    val fake = Multimodal.decodeFeatures(Seq(Multimodal.MediaRow(21L, "video",
      avi.take(30))).toDS()).collect()(0)
    assert(fake.height == (fake.width * 9) / 16)
  }

  test("sampleFrames: real extraction picks evenly spaced container frames") {
    val frames = Seq(0x112233, 0x445566, 0x778899, 0xAABBCC)
      .map(jpegFrame(8, 6, _))
    val avi = buildAvi(frames, w = 8, h = 6, usPerFrame = 40000)
    val got = Multimodal.sampleFrames(
        Seq(Multimodal.MediaRow(30L, "video", avi)).toDS(), n = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 2)
    assert(got.map(_.offset_ms).toSeq == Seq(0L, 80L)) // frames 0 and 2
    def poly(b: Array[Byte]) =
      b.foldLeft(1125899906842597L)((acc, x) => acc * 31 + x)
    assert(got(0).digest == poly(frames(0)))
    assert(got(1).digest == poly(frames(2)))
    assert(got(0).digest != got(1).digest)
    // n larger than the container: every real frame, no invented ones
    val all = Multimodal.sampleFrames(
      Seq(Multimodal.MediaRow(31L, "video", avi)).toDS(), n = 9).collect()
    assert(all.length == 4)
  }
}
