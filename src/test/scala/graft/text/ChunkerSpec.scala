package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping chunks cover every token, last chunk may be short") {
    val df = Seq(("d1", "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = Chunker.chunks(df, "doc_id", "text", width = 3, stride = 2)
      .select("chunk_id", "start_tok", "n_toks")
      .as[(Int, Int, Int)].collect().toSet
    // n=7: imax = ceil((7-3)/2) = 2 → token starts 1, 3, 5
    assert(got == Set((0, 1, 3), (1, 3, 3), (2, 5, 3)))
  }

  test("doc shorter than width yields exactly one chunk") {
    val df = Seq(("d1", "a b")).toDF("doc_id", "text")
    val got = Chunker.chunks(df, "doc_id", "text", width = 16, stride = 12)
      .select("chunk_id", "start_tok", "n_toks").as[(Int, Int, Int)].collect()
    assert(got.toSeq == Seq((0, 1, 2)))
  }

  test("tail not divisible by stride emits a final short chunk reaching the last token") {
    val df = Seq(("d1", (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunker.chunks(df, "doc_id", "text", width = 4, stride = 3)
      .select("chunk_id", "start_tok", "n_toks").as[(Int, Int, Int)]
      .collect().sortBy(_._1)
    // n=10, W=4, S=3: imax = ceil(6/3) = 2 → starts 1, 4, 7 (7..10 reaches the tail)
    assert(rows.toSeq == Seq((0, 1, 4), (1, 4, 4), (2, 7, 4)))
    // every token index is inside some chunk
    val covered = rows.flatMap { case (_, s, n) => s until (s + n) }.toSet
    assert(covered == (1 to 10).toSet)
  }

  test("chunk hashes identify identical passages across docs") {
    val df = Seq(("d1", "x y z"), ("d2", "x y z")).toDF("doc_id", "text")
    val md5s = Chunker.chunks(df, "doc_id", "text", width = 8, stride = 8)
      .select("chunk_md5").as[String].collect()
    assert(md5s.distinct.length == 1)
  }
}
