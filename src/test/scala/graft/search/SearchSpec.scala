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

  test("bm25 handles dotted terms, duplicate terms, and rejects empty queries") {
    // Term-derived column aliases would make col("w_table.") parse as a
    // field access (AnalysisException) and duplicate terms an ambiguous
    // reference; aliases are positional now. Duplicate terms dedupe
    // (scoring a term twice is not BM25), empty queries fail fast.
    val dotted = Seq((1L, "hash table. lookup"), (2L, "other text")).toDF("id", "text")
    val top = Bm25.topK(dotted, "id", "text", Seq("table."), k = 2)
      .select("id").as[Long].collect()
    assert(top.headOption.contains(1L), s"dotted term must score doc 1: ${top.toSeq}")
    val dup = Bm25.topK(docs, "id", "text", Seq("spark", "spark"), k = 3)
    val single = Bm25.topK(docs, "id", "text", Seq("spark"), k = 3)
    assert(dup.collect().map(_.toSeq).toSeq == single.collect().map(_.toSeq).toSeq)
    intercept[IllegalArgumentException](Bm25.topK(docs, "id", "text", Nil, k = 1))
  }

  test("doc with no query terms never appears; tf saturation bounds repeat gain") {
    val res = Bm25.topK(docs, "id", "text", Seq("spark", "merge", "window"), k = 5)
    val ids = res.select("id").as[Long].collect().toSet
    assert(!ids.contains(5L))
    // BM25 tf saturation: 3x"spark" (doc 1) must not beat 3 distinct terms (doc 2)
    val scores = res.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(1L))
  }

  test("phraseCount finds adjacent tokens, case/punct-insensitively") {
    val d = Seq(
      (1L, "the Table. hash join"),        // "Table." then "hash" — 1 hit
      (2L, "table x hash"),                // not adjacent — no row
      (3L, "table hash table hash table"), // two occurrences
      (4L, "hash table")                   // reversed — no row
    ).toDF("id", "text")
    val hits = PhraseSearch.phraseCount(d, "id", "text", Seq("table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 3L -> 2L))
  }

  test("phraseCount handles 3-term phrases and overlapping repeats") {
    val d = Seq(
      (1L, "x y z x y z"),   // two full occurrences
      (2L, "x y x y z"),     // one (first x-y lacks the z)
      (3L, "a a a a")        // self-overlap: "a a a" at pos 0 and 1
    ).toDF("id", "text")
    val xyz = PhraseSearch.phraseCount(d, "id", "text", Seq("x", "y", "z"))
      .as[(Long, Long)].collect().toMap
    assert(xyz == Map(1L -> 2L, 2L -> 1L))
    val aaa = PhraseSearch.phraseCount(d, "id", "text", Seq("a", "a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(aaa == Map(3L -> 2L))
  }

  test("postings are sorted doc ids, df and total_tf consistent") {
    val p = InvertedIndex.postings(docs, "id", "text", maxPostings = 10)
      .filter(col("term") === "spark")
      .select("df", "total_tf", "postings")
      .as[(Long, Long, Seq[Long])].collect().head
    assert(p == ((3L, 5L, Seq(1L, 2L, 4L))))
  }
}
