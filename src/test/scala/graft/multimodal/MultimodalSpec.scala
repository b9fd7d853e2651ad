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

  test("audio kind gets a duration; image does not") {
    val df = Seq((1L, "wavbytes")).toDF("id", "text")
    val img = Multimodal.decodeFeatures(Multimodal.fromText(df, "id", "text", "image")).collect()(0)
    val aud = Multimodal.decodeFeatures(Multimodal.fromText(df, "id", "text", "audio")).collect()(0)
    assert(img.duration_ms == 0L)
    assert(aud.duration_ms >= 0L && img.digest == aud.digest)
  }
}
