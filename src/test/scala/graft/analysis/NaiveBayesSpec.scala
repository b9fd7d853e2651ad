package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // two clearly-separated classes: "spam" is money-words, "ham" is greetings
  private def corpus = Seq(
    ("spam", "win money money prize"),
    ("spam", "free money win"),
    ("spam", "prize money free win"),
    ("ham", "hello dear friend"),
    ("ham", "dear friend hello hello"),
    ("ham", "see you friend")
  ).toDF("label", "text").withColumn("id", monotonically_increasing_id())

  test("labelStats carries exact counts and smoothed NLL terms") {
    val (_, stats) = NaiveBayes.train(corpus, "label", "text")
    val rows = stats.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDecimal(3).doubleValue(), r.getDecimal(4).doubleValue())).toMap
    val (nSpam, totSpam, priorSpam, unseenSpam) = rows("spam")
    assert(nSpam == 3 && totSpam == 11)
    // priors: 3/6 each
    assert(math.abs(priorSpam - (-math.log(0.5))) < 1e-9)
    // vocab = 9 distinct tokens across BOTH classes
    assert(math.abs(unseenSpam - (-math.log(1.0 / (11 + 9)))) < 1e-9)
    val (nHam, totHam, _, unseenHam) = rows("ham")
    assert(nHam == 3 && totHam == 10)
    assert(math.abs(unseenHam - (-math.log(1.0 / (10 + 9)))) < 1e-9)
  }

  test("classify routes obvious docs to the right class") {
    val (model, stats) = NaiveBayes.train(corpus, "label", "text")
    val docs = Seq((100L, "money money free"), (101L, "hello friend"),
      (102L, "win prize"), (103L, "dear dear hello")).toDF("id", "text")
    val got = NaiveBayes.classify(docs, "id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(100L -> "spam", 101L -> "ham", 102L -> "spam", 103L -> "ham"))
  }

  test("score equals the hand-computed smoothed NLL (sparse+dense decomposition)") {
    val (model, stats) = NaiveBayes.train(corpus, "label", "text")
    val docs = Seq((7L, "money unknownword")).toDF("id", "text")
    val row = NaiveBayes.classify(docs, "id", "text", model, stats)
      .filter(col("pred_label") === "spam").collect().head
    // spam: prior -ln(1/2); money count 4 -> -ln(5/20); unknown -> -ln(1/20)
    val want = -math.log(0.5) - math.log(5.0 / 20) - math.log(1.0 / 20)
    assert(math.abs(row.getDouble(2) - want) < 1e-3, s"got ${row.getDouble(2)}, want $want")
  }

  test("zero-token docs are absent; every emitted doc gets exactly one label") {
    val (model, stats) = NaiveBayes.train(corpus, "label", "text")
    val docs = Seq((1L, "   "), (2L, "money")).toDF("id", "text")
    val got = NaiveBayes.classify(docs, "id", "text", model, stats).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
