package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: DataFrame): Map[Long, Double] =
    BigramLm.score(docs, "doc_id", "text",
        BigramLm.train(docs, "doc_id", "text"), UnigramLm.train(docs, "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("scrambled word order scores worse than the dominant order") {
    // 20 docs establish "the cat sat" as the dominant transition
    // structure; doc 100 uses the SAME unigrams in a never-seen order.
    // A unigram model cannot distinguish them; the bigram model must.
    val docs = ((1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (100L, "mat the on sat cat the")).toDF("doc_id", "text")
    val s = score(docs)
    assert(s(100L) > s(1L) + 0.1,
      s"scrambled ${s(100L)} should exceed fluent ${s(1L)}")
    // same unigram bag → identical unigram scores (blindness check)
    val uni = UnigramLm.score(docs, "doc_id", "text",
        UnigramLm.train(docs, "text"), java.math.BigDecimal.ZERO)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(100L) == uni(1L))
  }

  test("hand-computed score on a two-doc corpus") {
    // corpus: "a b" ×2 — bigrams: (a,b) ×2; c1(a)=2; unigrams a:2 b:2,
    // T=4, V=2. p(b|a) = 0.7·(2/2) + 0.3·(3/6) = 0.85
    // p_uni(a) = (2+1)/(4+2) = 0.5
    // doc score = (-ln 0.5 + -ln 0.85) / 2
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val s = score(docs)
    val expected = (-math.log(0.5) - math.log(0.85)) / 2.0
    assert(math.abs(s(1L) - expected) < 5e-5, s"${s(1L)} vs $expected")
  }

  test("single-token and multi-token docs coexist; counts are right") {
    val docs = Seq((1L, "x"), (2L, "x y x")).toDF("doc_id", "text")
    val out = BigramLm.score(docs, "doc_id", "text",
        BigramLm.train(docs, "doc_id", "text"), UnigramLm.train(docs, "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L))
  }

  test("scores are partition-invariant (decimal sums)") {
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7}"))
      .toDF("doc_id", "text")
    val a = score(docs)
    val b = score(docs.repartition(13))
    assert(a == b)
  }
}
