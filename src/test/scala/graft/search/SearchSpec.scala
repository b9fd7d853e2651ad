package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark merge window"),
    (3L, "merge merge merge merge"),
    (4L, "window functions in spark"),
    (5L, "nothing relevant here")
  ).toDF("id", "text")

  test("termFreqs counts per-doc tf and doc length") {
    val tf = Bm25.termFreqs(docs, "id", "text")
      .filter(col("id") === 1L && col("term") === "spark")
      .select("tf", "dl").as[(Long, Int)].collect()
    assert(tf.toSeq == Seq((3L, 4)))
  }

  test("bm25 ranks the all-terms doc above single-term docs") {
    val top = Bm25.topK(docs, "id", "text", Seq("spark", "merge", "window"), k = 3)
      .orderBy(col("score").desc, col("id")).select("id").as[Long].collect()
    // doc 2 matches all three query terms — must rank first
    assert(top.head == 2L)
  }

  test("doc with no query terms never appears; tf saturation bounds repeat gain") {
    val res = Bm25.topK(docs, "id", "text", Seq("spark", "merge", "window"), k = 5)
    val ids = res.select("id").as[Long].collect().toSet
    assert(!ids.contains(5L))
    // BM25 tf saturation: 3x"spark" (doc 1) must not beat 3 distinct terms (doc 2)
    val scores = res.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(1L))
  }

  test("postings are sorted doc ids, df and total_tf consistent") {
    val p = InvertedIndex.postings(docs, "id", "text", maxPostings = 10)
      .filter(col("term") === "spark")
      .select("df", "total_tf", "postings")
      .as[(Long, Long, Seq[Long])].collect().head
    assert(p == ((3L, 5L, Seq(1L, 2L, 4L))))
  }
}
