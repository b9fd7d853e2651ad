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
}
