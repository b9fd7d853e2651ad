package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` payloads with typed metadata; decode/feature-extraction runs
  * per partition in batches (the Scala analog of an arrow-batched UDF).
  *
  * The decode itself is a clearly-marked deterministic STAND-IN — codec
  * libraries are not on this offline classpath — but everything Spark
  * cares about is real: the schema, the per-partition batch iteration,
  * the partitioning (decode is scan-side, no shuffle), and the typed
  * output. Swap `fakeDecode` for a jpeg/pcm decoder in production.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, digest: Long,
      width: Int, height: Int, duration_ms: Long, feature: Array[Float])

  /** STAND-IN decoder: derives deterministic pseudo-features from the
    * payload bytes (xxhash-seeded). Replace with a real codec. */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val h = r.payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
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

  /** Batched per-partition decode: one pass per partition, constant
    * memory, output is a typed Dataset ready for columnar ops. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
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
      batch.iterator.map(fakeDecode)
    })
  }

  /** STAND-IN resize: recompute features at a target resolution. A real
    * codec reads `payload` and scales pixels; the stand-in rescales the
    * deterministic fake dims, keeping the schema/partitioning contract
    * (scan-side map, no shuffle). */
  def resize(feats: Dataset[MediaFeatures], maxWidth: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      if (f.width <= maxWidth) f
      else f.copy(width = maxWidth, height = (maxWidth * 9) / 16)
    }
  }

  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, digest: Long)

  /** STAND-IN frame sampling: emit `n` evenly-spaced frames per video
    * payload (flatMap — one input row fans out to n typed rows, the
    * shape a real ffmpeg-backed sampler produces). Frame digests derive
    * deterministically from the payload bytes + index. */
  def sampleFrames(media: Dataset[MediaRow], n: Int,
                   durationMs: Long = 60000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val h = r.payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      (0 until n).map { i =>
        Frame(r.media_id, i, i.toLong * durationMs / math.max(n, 1), h * 31 + i)
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
