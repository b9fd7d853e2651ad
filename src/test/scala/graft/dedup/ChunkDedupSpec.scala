package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  // width=3 chunks: doc 1 → ["a b c", "d e f"]; doc 2 repeats doc 1's
  // first chunk then adds its own; doc 3 is entirely doc 1's chunks.
  private def docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c x y z"),
    (3L, "d e f a b c")
  ).toDF("id", "text")

  test("chunks splits into width-token windows with a short tail") {
    val ch = ChunkDedup.chunks(Seq((1L, "a b c d")).toDF("id", "text"), "id", "text", 3)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    assert(ch.toSeq == Seq("a b c", "d"))
  }

  test("keep-first keeps the globally first occurrence only") {
    val marked = ChunkDedup.keepFirst(ChunkDedup.chunks(docs, "id", "text", 3), "id")
    val kept = marked.filter(col("is_kept"))
      .select("id", "chunk").as[(Long, String)].collect().toSet
    // doc1 owns both its chunks (first by (id, idx)); doc2 keeps only
    // "x y z"; doc3 keeps nothing.
    assert(kept == Set((1L, "a b c"), (1L, "d e f"), (2L, "x y z")))
  }

  test("survival report totals are consistent") {
    val s = ChunkDedup.survival(docs, "id", "text", 3)
      .orderBy("id").select("id", "n_chunks", "n_kept", "n_dropped")
      .as[(Long, Long, Long, Long)].collect()
    assert(s.toSeq == Seq((1L, 2L, 2L, 0L), (2L, 2L, 1L, 1L), (3L, 2L, 0L, 2L)))
  }

  test("empty document produces no chunks") {
    val n = ChunkDedup.chunks(Seq((9L, "   ")).toDF("id", "text"), "id", "text", 3).count()
    assert(n == 0L)
  }

  test("streaming twin: chunk explode + watermark dedup keeps first passage occurrence") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val chunked = ChunkDedup.chunks(
        input.toDF().toDF("ts", "id", "text"), "id", "text", 3)
    val deduped = graft.streaming.StreamingOps.dedupStream(chunked, "ts", "chunk_hash")
    val q = deduped.writeStream.format("memory")
      .queryName("chunk_dedup_out").outputMode("append").start()
    try {
      input.addData((Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "a b c d e f"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-03-01 10:05:00"), 2L, "a b c x y z"))
      q.processAllAvailable()
      val kept = spark.table("chunk_dedup_out")
        .select("id", "chunk").as[(Long, String)].collect().toSet
      // doc 2's repeated "a b c" passage is suppressed; its novel chunk passes
      assert(kept == Set((1L, "a b c"), (1L, "d e f"), (2L, "x y z")))
    } finally q.stop()
  }
}
