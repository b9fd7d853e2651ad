package graft.dedup

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 owns the passage "a b c d"; doc 2 repeats it mid-text at an
  // UNALIGNED offset (straddles any width-2 chunk boundary); doc 3 is
  // clean; doc 4 is too short for a window.
  private def corpus = Seq(
    (1L, "a b c d x1 x2"),
    (2L, "y1 a b c d y2"),
    (3L, "p q r s t u"),
    (4L, "z")
  ).toDF("doc_id", "text")

  test("report finds straddling duplicated spans chunk-dedup misses") {
    val r = SubstringDedup.report(corpus, "doc_id", "text", width = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // doc 2 windows: (y1,a)(a,b)(b,c)(c,d)(d,y2); (a,b)(b,c)(c,d) are dups
    // of doc 1's -> covered positions 1..4 = 4 tokens removed
    assert(r(0) == ((1L, 6L, 5L, 0L, 0L)))
    assert(r(1) == ((2L, 6L, 5L, 3L, 4L)))
    assert(r(2) == ((3L, 6L, 5L, 0L, 0L)))
    assert(r(3) == ((4L, 1L, 0L, 0L, 0L)))
  }

  test("prune cuts exactly the covered positions, keeping first occurrences") {
    val p = SubstringDedup.prune(corpus, "doc_id", "text", width = 2)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(p(1L) == "a b c d x1 x2") // first occurrence untouched
    assert(p(2L) == "y1 y2")         // the repeated passage cut as one span
    assert(p(3L) == "p q r s t u")
    assert(p(4L) == "z")
  }

  test("within-doc repetition beyond the first window is also removed") {
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = SubstringDedup.report(d, "doc_id", "text", width = 2).collect().head
    // windows: (a,b)(b,a)(a,b)(b,a)(a,b) -> dups at pos 2,3,4 cover 2..5
    assert((r.getLong(3), r.getLong(4)) == ((3L, 4L)))
    val p = SubstringDedup.prune(d, "doc_id", "text", width = 2)
      .collect().head.getString(1)
    assert(p == "a b")
  }
}
