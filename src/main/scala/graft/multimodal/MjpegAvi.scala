package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM MJPEG-AVI container parser: RIFF chunk walk over the
  * standard AVI layout (`RIFF 'AVI ' → LIST hdrl → avih`, `LIST movi →
  * 00dc` frame chunks), each `00dc` payload being an ordinary JPEG that
  * `javax.imageio` decodes. Exists so the video tier of `Multimodal` is
  * a REAL codec path like the PNG (image) and PCM-WAV (audio) ones —
  * no ffmpeg in this environment, but MJPEG-in-AVI is decodable with
  * what the JVM ships.
  *
  * Parsing is defensive, not validating: any structural surprise
  * (truncated chunk, missing header) returns None and the caller falls
  * back to the quarantine stand-in — a corrupt video in 100 TB of media
  * must yield a flaggable row, not a job abort.
  */
object MjpegAvi {

  /** (width, height, microSecPerFrame, totalFrames, frame JPEG payloads) */
  case class Avi(width: Int, height: Int, usPerFrame: Long,
      totalFrames: Int, frames: Seq[Array[Byte]])

  def looksLikeAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'A'.toByte && b(9) == 'V'.toByte &&
      b(10) == 'I'.toByte && b(11) == ' '.toByte

  def parse(bytes: Array[Byte]): Option[Avi] = {
    if (!looksLikeAvi(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var width = 0; var height = 0; var usPerFrame = 0L; var total = 0
      val frames = Seq.newBuilder[Array[Byte]]

      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }

      /** Walk the chunks of [start, end); recurse into LISTs. */
      def walk(start: Int, end: Int): Unit = {
        bb.position(start)
        while (bb.position() + 8 <= end) {
          val id = fourcc()
          val size = bb.getInt()
          val body = bb.position()
          if (size < 0 || body + size > end) return // truncated — stop
          id match {
            case "LIST" =>
              fourcc() // list type (hdrl / movi / strl) — walk all alike
              walk(body + 4, body + size)
            case "avih" =>
              // dwMicroSecPerFrame @0, dwTotalFrames @16, dwWidth @32,
              // dwHeight @36 (all LE u32)
              if (size >= 40) {
                usPerFrame = bb.getInt(body) & 0xFFFFFFFFL
                total = bb.getInt(body + 16)
                width = bb.getInt(body + 32)
                height = bb.getInt(body + 36)
              }
            case "00dc" | "00db" =>
              val f = new Array[Byte](size)
              bb.position(body); bb.get(f); frames += f
            case _ => // strh/strf/idx1/JUNK — not needed
          }
          // chunks are word-aligned: skip pad byte on odd sizes
          bb.position(body + size + (size & 1))
        }
      }

      walk(12, math.min(bytes.length, 8 + bb.getInt(4)))
      val fs = frames.result()
      if (width <= 0 || height <= 0 || usPerFrame <= 0 || fs.isEmpty) None
      else Some(Avi(width, height, usPerFrame,
        if (total > 0) total else fs.length, fs))
    } catch { case _: Exception => None }
  }
}
