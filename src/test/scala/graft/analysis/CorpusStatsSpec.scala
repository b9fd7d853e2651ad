package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-5 corpus-statistics operators: token entropy,
  * KL drift, PMI collocations, and DSIR importance weighting. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenEntropy: uniform tokens maximize, repetition collapses") {
    val docs = Seq(
      (1L, "a b c d"),     // 4 distinct of 4 → H = ln 4
      (2L, "a a a a"),     // degenerate → H = 0
      (3L, "a a b b")      // 2 distinct, uniform → H = ln 2
    ).toDF("id", "text")
    val h = TextAnalysis.tokenEntropy(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(h(1L) - math.log(4)) < 1e-3)
    assert(h(2L) == 0.0)
    assert(math.abs(h(3L) - math.log(2)) < 1e-3)
    assert(h(2L) < h(3L) && h(3L) < h(1L))
  }

  test("tokenEntropy is partition-order independent") {
    val docs = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} common"))
      .toDF("id", "text")
    val a = TextAnalysis.tokenEntropy(docs, "id", "text")
      .orderBy("id").collect().map(_.getDouble(3)).toSeq
    val b = TextAnalysis.tokenEntropy(docs.repartition(13), "id", "text")
      .orderBy("id").collect().map(_.getDouble(3)).toSeq
    assert(a == b)
  }

  test("distributionDrift: identical groups have near-zero KL, skewed group more") {
    val docs = Seq(
      (1L, "same", "a b c a b c"),
      (2L, "same", "a b c a b c"),
      (3L, "skew", "z z z z z z")
    ).toDF("id", "grp", "text")
    val kl = TextAnalysis.distributionDrift(docs, "grp", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl("skew") > kl("same"))
    assert(kl("same") >= 0.0 && kl("skew") > 0.1)
  }

  test("distributionDrift covers the full corpus vocab per group") {
    val docs = Seq((1L, "g1", "a b"), (2L, "g2", "c d")).toDF("id", "grp", "text")
    val rows = TextAnalysis.distributionDrift(docs, "grp", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // each group saw 2 of the 4 corpus terms
    assert(rows == Set(("g1", 2L, 2L), ("g2", 2L, 2L)))
  }

  test("pmiBigrams: an exclusive pair beats a promiscuous one") {
    // "new york" always adjacent; "the" pairs with everything.
    val base = (1 to 30).map(i => (i.toLong, "new york visits the city"))
    val noise = (31 to 60).map(i => (i.toLong, s"the w${i % 9} holds the w${i % 7}"))
    val docs = (base ++ noise).toDF("id", "text")
    val top = TextAnalysis.pmiBigrams(docs, "text", minCount = 5L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top.head == (("new", "york")))
  }

  test("pmiBigrams respects the min-count gate") {
    val docs = (1 to 20).map(i => (i.toLong, s"alpha beta gamma delta"))
      .toDF("id", "text") // every bigram appears 20 times
    val rare = Seq((21L, "once only")).toDF("id", "text")
    val top = TextAnalysis.pmiBigrams(docs.union(rare), "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!top.contains(("once", "only")))
    assert(top.contains(("alpha", "beta")))
  }

  test("Dsir: in-target-domain docs get the highest importance weight") {
    val target = (1 to 20).map(i => (i.toLong, "t", "finance stock bond market yield"))
    val other = (21 to 80).map(i => (i.toLong, "o", s"cat dog w${i % 11} bird fish"))
    val mixed = Seq((81L, "o", "finance stock cat dog yield"))
    val docs = (target ++ other ++ mixed).toDF("id", "src", "text")
    val top = Dsir.topImportance(docs, "id", "text", col("src") === "t", k = 25)
      .collect().map(_.getLong(0)).toSet
    // all 20 target docs plus the half-finance doc outrank the pet corpus
    assert((1L to 20L).toSet.subsetOf(top))
    assert(top.contains(81L))
  }

  test("Dsir weights are partition-order independent (decimal sums)") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 3 == 0) "t" else "o", s"w${i % 13} w${i % 7} shared w${i % 5}"))
      .toDF("id", "src", "text")
    val a = Dsir.topImportance(docs, "id", "text", col("src") === "t", k = 50)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Dsir.topImportance(docs.repartition(11), "id", "text",
        col("src") === "t", k = 50)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b)
  }
}
