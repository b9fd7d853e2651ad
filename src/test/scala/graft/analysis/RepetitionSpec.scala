package graft.analysis

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats flags a looping doc and clears a clean one") {
    val df = Seq(
      ("rep", "a b a b a"),   // bigrams: "a b"×2, "b a"×2; trigrams: "a b a"×2, "b a b"×1
      ("cln", "u v w x y"))   // all grams unique
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(String, Int, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

    val (_, n1, top1, f1, dup1, df1) = got("rep")
    assert(n1 == 5 && top1 == 2L)
    assert(f1 == 0.8)          // 2 occurrences × 2 tokens / 5
    assert(dup1 == 2L && df1 == 0.6667) // 2 of 3 trigram occurrences repeat

    val (_, n2, top2, f2, dup2, df2) = got("cln")
    assert(n2 == 5 && top2 == 1L && dup2 == 0L)
    assert(f2 == 0.4 && df2 == 0.0)
  }

  test("docs with 0/1/2 tokens are REPORTED with zero stats, not dropped") {
    // Pre-fix, the inner joins onto the bigram/trigram aggregates
    // silently removed exactly the short docs a quality gate most needs
    // to see.
    val df = Seq(
      ("empty", ""), ("one", "solo"), ("two", "a b"), ("big", "x y z w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(String, Int, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("empty", "one", "two", "big"),
      s"short docs must not vanish: ${got.keySet}")
    assert(got("empty") == (("empty", 0, 0L, 0.0, 0L, 0.0)))
    assert(got("one") == (("one", 1, 0L, 0.0, 0L, 0.0)))
    val (_, n2, t2, f2, d2, df2) = got("two") // one bigram, no trigram
    assert(n2 == 2 && t2 == 1L && f2 == 1.0 && d2 == 0L && df2 == 0.0)
  }

  test("a fully degenerate doc maxes both fractions") {
    val df = Seq(("deg", "z z z z z z")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(String, Int, Long, Double, Long, Double)].head()
    assert(r._3 == 5L)   // "z z" appears 5 times
    assert(r._5 == 4L && r._6 == 1.0) // all 4 trigram occurrences are dups
  }
}
