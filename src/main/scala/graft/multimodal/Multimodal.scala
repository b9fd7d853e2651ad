package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` payloads with typed metadata; decode/feature-extraction runs
  * per partition in batches (the Scala analog of an arrow-batched UDF).
  *
  * All three kinds now have REAL pure-JVM codec paths, each behind a
  * cheap magic-byte sniff: images via javax.imageio (PNG/JPEG — true
  * pixel dims + luminance histogram), audio via javax.sound.sampled
  * (PCM WAV — true duration + RMS profile), video via the `MjpegAvi`
  * RIFF parser + per-frame javax.imageio JPEG decode (true container
  * dims/duration + first-frame histogram, real frame extraction in
  * `sampleFrames`). Payloads no sniff claims — or that fail their
  * codec — fall back to the deterministic `fakeDecode` STAND-IN:
  * quarantine-able rows, never job aborts. Everything Spark cares
  * about is identical on every path: the schema, the per-partition
  * batch iteration, the partitioning (decode is scan-side, no
  * shuffle), and the typed output.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, digest: Long,
      width: Int, height: Int, duration_ms: Long, feature: Array[Float])

  /** Deterministic polynomial digest of a payload (the stand-in for a
    * content hash — ONE definition so decode() and sampleFrames() can
    * never silently diverge; it appeared inline six times before). */
  private def payloadDigest(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)

  /** STAND-IN decoder: derives deterministic pseudo-features from the
    * payload bytes (xxhash-seeded). Replace with a real codec. */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val h = payloadDigest(r.payload)
    // Mask instead of math.abs: abs(Long.MinValue) is negative, which
    // would yield width 0/negative and a negative duration for that
    // one-in-2^64 payload.
    val hPos = h & Long.MaxValue
    val w = (hPos % 1920 + 1).toInt
    val feat = Array.tabulate(8)(i => ((h >> (i * 8)) & 0xff).toFloat / 255f)
    MediaFeatures(r.media_id, r.kind, r.payload.length, h,
      width = w, height = (w * 9) / 16,
      duration_ms = if (r.kind == "audio") hPos % 300000 else 0L,
      feature = feat)
  }

  /** PNG / JPEG magic-byte sniff — the cheap gate that keeps the real
    * image decoder off payloads that can't be images (a failed
    * ImageIO.read probe on arbitrary bytes costs far more than two
    * byte compares per row). */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte) ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte))

  /** REAL image decode (javax.imageio — pure JVM): true width/height and
    * an 8-bin normalized luminance histogram as the feature vector.
    * Undecodable payloads fall back to [[fakeDecode]] rather than
    * failing the task — a corrupt image in 100 TB of media must yield a
    * quarantine-able row, not a job abort. Per-pixel getRGB is fine at
    * fixture scale; a production codec reads the raster buffer in bulk. */
  def imageDecode(r: MediaRow): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) fakeDecode(r)
    else {
      val h = payloadDigest(r.payload)
      MediaFeatures(r.media_id, r.kind, r.payload.length, h,
        width = img.getWidth, height = img.getHeight, duration_ms = 0L,
        feature = lumaHistogram(img))
    }
  }

  /** 8-bin normalized luminance histogram — the shared feature vector
    * of the image and video (first-frame) codec paths. Per-pixel getRGB
    * is fine at fixture scale; a production codec reads the raster
    * buffer in bulk. */
  private def lumaHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val hist = new Array[Float](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 5) += 1f
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth.toLong * img.getHeight).toFloat
    hist.map(_ / n)
  }

  /** RIFF/WAVE magic-byte sniff — same cheap gate as the image probe. */
  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte

  /** REAL audio decode (javax.sound.sampled — pure JVM, PCM WAV): true
    * duration from the frame count/rate and an 8-segment normalized RMS
    * loudness profile as the feature vector (channel 0 of 16-bit PCM).
    * Anything the JVM codec can't parse (compressed formats, truncated
    * payloads) falls back to [[fakeDecode]] — quarantine-able rows, not
    * job aborts, same policy as the image path. */
  def audioDecode(r: MediaRow): MediaFeatures = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      if (frames <= 0 || fmt.getFrameRate <= 0 || fmt.getSampleSizeInBits != 16)
        fakeDecode(r)
      else {
        val durMs = (frames * 1000.0 / fmt.getFrameRate).toLong
        val data = ais.readAllBytes()
        val stride = fmt.getFrameSize // all channels; we read channel 0
        val bigEndian = fmt.isBigEndian
        val n = data.length / stride
        val rms = new Array[Double](8)
        val cnt = new Array[Long](8)
        var i = 0
        while (i < n) {
          val off = i * stride
          val s =
            if (bigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
            else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
          val seg = (i * 8L / math.max(n, 1)).toInt
          rms(seg) += s.toDouble * s.toDouble
          cnt(seg) += 1
          i += 1
        }
        val h = payloadDigest(r.payload)
        val feat = Array.tabulate(8)(j =>
          if (cnt(j) == 0) 0f
          else (math.sqrt(rms(j) / cnt(j)) / Short.MaxValue).toFloat)
        MediaFeatures(r.media_id, r.kind, r.payload.length, h,
          width = 0, height = 0, duration_ms = durMs, feature = feat)
      }
    } catch { case _: Exception => fakeDecode(r) }
  }

  /** REAL video decode (MJPEG-AVI via `MjpegAvi` + javax.imageio —
    * pure JVM): true container dims, duration from the frame count ×
    * frame interval, and the first frame's 8-bin luminance histogram as
    * the feature vector (the per-frame work a real sampler amortizes).
    * Anything that isn't a parseable MJPEG-AVI falls back to
    * [[fakeDecode]] — same quarantine policy as image/audio. */
  def videoDecode(r: MediaRow): MediaFeatures =
    MjpegAvi.parse(r.payload) match {
      case None => fakeDecode(r)
      case Some(avi) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(avi.frames.head))
          catch { case _: Exception => null }
        if (img == null) fakeDecode(r)
        else {
          val h = payloadDigest(r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length, h,
            width = avi.width, height = avi.height,
            duration_ms = avi.totalFrames * avi.usPerFrame / 1000L,
            feature = lumaHistogram(img))
        }
    }

  /** Kind-dispatching decoder: the real JVM image codec for image
    * payloads carrying a PNG/JPEG header, the real JVM WAV codec for
    * audio payloads carrying a RIFF/WAVE header, the real MJPEG-AVI
    * codec for video payloads carrying a RIFF/AVI header, and the
    * deterministic stand-in for everything else (unparseable bytes).
    * This is the default codec of both decode entry points. */
  def decode(r: MediaRow): MediaFeatures =
    if (r.kind == "image" && looksLikeImage(r.payload)) imageDecode(r)
    else if (r.kind == "audio" && looksLikeWav(r.payload)) audioDecode(r)
    else if (r.kind == "video" && MjpegAvi.looksLikeAvi(r.payload)) videoDecode(r)
    else fakeDecode(r)

  /** Batched per-partition decode: one pass per partition, constant
    * memory, output is a typed Dataset ready for columnar ops. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** Decode with an EXPLICIT batch shape — the Scala analog of an
    * arrow-batched (`mapInPandas`-style) UDF: the partition iterator is
    * consumed in `batchSize` chunks so a real codec can amortize per-
    * batch setup (decoder init, GPU transfer, arrow buffer) across the
    * batch, while streaming batch-by-batch keeps memory constant
    * regardless of partition size. Same rows out as `decodeFeatures`. */
  def decodeFeaturesBatched(media: Dataset[MediaRow],
                            batchSize: Int = 64): Dataset[MediaFeatures] = {
    require(batchSize > 0)
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap { batch =>
      // per-batch setup would happen here (decoder/session init)
      batch.iterator.map(decode)
    })
  }

  /** Feature-level resize (stand-in dims): rescales already-decoded
    * feature rows without touching payloads. [[resizeImages]] below is
    * the REAL payload-level operation. */
  def resize(feats: Dataset[MediaFeatures], maxWidth: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      if (f.width <= maxWidth) f
      else f.copy(width = maxWidth, height = (maxWidth * 9) / 16)
    }
  }

  /** REAL image resize (pure JVM): decode, scale down to fit `maxWidth`
    * preserving aspect ratio (Graphics2D bilinear), re-encode as PNG —
    * the thumbnail/normalize pass a vision-data pipeline runs before
    * feature extraction. Payloads that are not decodable images, or are
    * already narrow enough, pass through byte-identical (quarantine-not-
    * abort, same policy as decode). Scan-side `mapPartitions`, no
    * shuffle: at 100 TB the bytes never leave the partition that read
    * them, and output size shrinks monotonically. */
  def resizeImages(media: Dataset[MediaRow], maxWidth: Int): Dataset[MediaRow] = {
    require(maxWidth > 0, s"maxWidth=$maxWidth must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img =
        if (r.kind != "image" || !looksLikeImage(r.payload)) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
      if (img == null || img.getWidth <= maxWidth || img.getHeight <= 0) r
      else {
        val h = math.max(1, (img.getHeight.toLong * maxWidth / img.getWidth).toInt)
        val out = new java.awt.image.BufferedImage(
          maxWidth, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, maxWidth, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRow(r.media_id, r.kind, bos.toByteArray)
      }
    })
  }

  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, digest: Long)

  /** Frame sampling (flatMap — one input row fans out to n typed rows):
    * REAL extraction for MJPEG-AVI video payloads — up to `n` evenly
    * spaced container frames, true offsets from the frame interval,
    * digest = polynomial hash of the frame's own JPEG bytes; the
    * deterministic stand-in fan-out for every other payload (same
    * quarantine policy as `decode`). */
  def sampleFrames(media: Dataset[MediaRow], n: Int,
                   durationMs: Long = 60000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val avi = if (r.kind == "video") MjpegAvi.parse(r.payload) else None
      avi match {
        case Some(a) =>
          val take = math.min(n, a.frames.length)
          (0 until take).map { i =>
            val idx = (i.toLong * a.frames.length / math.max(take, 1)).toInt
            val fh = payloadDigest(a.frames(idx))
            Frame(r.media_id, i, idx * a.usPerFrame / 1000L, fh)
          }
        case None =>
          val h = payloadDigest(r.payload)
          (0 until n).map { i =>
            Frame(r.media_id, i, i.toLong * durationMs / math.max(n, 1), h * 31 + i)
          }
      }
    }
  }

  /** Build a media Dataset from any table with a binary-able column —
    * test harness for the decode path. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), lit(kind), col(textCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, k, b) => MediaRow(id, k, b) }
  }
}
