package graft.nlp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextOps

class NlpFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq("good", "great")
  private val neg = Seq("bad", "awful")
  private def toks = TextOps.tokens(col("s"))

  test("sentimentScore: balanced, positive, negative, no-hit cases") {
    val got = Seq(
      "good bad day",          // (1-1)/2 = 0
      "good great stuff",      // 2/2 = 1
      "bad awful mess",        // -1
      "nothing matches here",  // 0/1 = 0
    ).toDF("s").select(NlpFunctions.sentimentScore(toks, pos, neg).as("r"))
      .as[Double].collect()
    assert(got.sameElements(Array(0.0, 1.0, -1.0, 0.0)))
  }

  test("sentimentLabeled thresholds at ±0.2") {
    val rows = Seq("good great win", "bad awful loss", "good bad mixed")
      .toDF("s").select(NlpFunctions.sentimentLabeled(toks, pos, neg).as("r"))
      .select("r.label").as[Int].collect()
    assert(rows.sameElements(Array(2, 0, 1)))
  }

  test("tfidfKeywords: rare term outranks common term; common-everywhere term scores 0") {
    val docs = Seq(
      (1L, "alpha alpha shared rare"),
      (2L, "beta shared common"),
      (3L, "gamma shared common"),
    ).toDF("doc_id", "text")
    val out = NlpFunctions.tfidfKeywords(docs, "doc_id", TextOps.tokens(col("text")), 2, 3L)
      .filter(col("doc_id") === 1)
      .orderBy("rank").select("term").as[String].collect()
    // 'shared' is in all 3 docs → ln(1)=0; alpha tf=2·ln(3) wins, rare tf=1·ln(3)
    assert(out.sameElements(Array("alpha", "rare")))
  }

  test("topic: argmax with tie order and 'other' fallback") {
    val profiles = Seq("a" -> Seq("x"), "b" -> Seq("y"))
    val got = Seq("x x y", "y", "z", "x y").toDF("s")
      .select(NlpFunctions.topic(toks, profiles).as("r")).as[String].collect()
    assert(got.sameElements(Array("a", "b", "other", "a"))) // tie → first profile
  }

  test("topic: NULL tokens classify as 'other', never the last profile") {
    val profiles = Seq("a" -> Seq("x"), "b" -> Seq("y"))
    val got = Seq(Option.empty[String], Some("y")).toDF("s")
      .select(NlpFunctions.topic(toks, profiles).as("r")).as[String].collect()
    assert(got.sameElements(Array("other", "b")), got.mkString(","))
  }

  test("tfidfKeywords never broadcasts the vocabulary-sized DF table") {
    // The DF side is Zipf-unbounded at corpus scale — the exact shape
    // Dsir.topImportance measured failing at ×30 (peak task memory
    // growing linearly); the join must be shuffle_hash, not broadcast.
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("id", "s")
    val plan = NlpFunctions.tfidfKeywords(docs, "id", toks, 2, 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"plan broadcasts the DF table:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle_hash join:\n$plan")
  }

  test("summary truncates to maxWords") {
    val got = Seq("one two three four five").toDF("s")
      .select(NlpFunctions.summary(toks, 3).as("r")).as[String].collect()(0)
    assert(got == "one two three")
  }

  test("wordSimilarity: identical = 1, one edit over 4 chars = 0.75") {
    val row = Seq(("hash", "hash", "hashy")).toDF("a", "b", "c")
      .select(NlpFunctions.wordSimilarity(col("a"), col("b")).as("same"),
        NlpFunctions.wordSimilarity(col("a"), col("c")).as("edit")).collect()(0)
    assert(row.getDouble(0) == 1.0)
    assert(math.abs(row.getDouble(1) - 0.8) < 1e-12) // lev 1 / len 5
  }

  test("hashEmbedding: deterministic, dim respected, norm grows with repetition") {
    val e1 = Seq("alpha beta gamma").toDF("s")
      .select(NlpFunctions.hashEmbedding(toks, 8).as("e")).as[Seq[Double]].collect()(0)
    val e2 = Seq("alpha beta gamma").toDF("s")
      .select(NlpFunctions.hashEmbedding(toks, 8).as("e")).as[Seq[Double]].collect()(0)
    assert(e1 == e2 && e1.length == 8)
    assert(e1.map(math.abs).sum == 3.0) // three ±1 contributions
  }

  test("textSimilarities: 1-vs-N jaccard shape (N8)") {
    val df = Seq(("a b c", Seq("a b c", "a x y", "z"))).toDF("src", "targets")
    val got = df.select(NlpFunctions.textSimilarities(
        TextOps.tokens(col("src")),
        transform(col("targets"), t => TextOps.tokens(t))).as("r"))
      .as[Seq[Double]].collect()(0)
    assert(got.head == 1.0)
    assert(math.abs(got(1) - 0.2) < 1e-12) // |{a}|/|{a,b,c,x,y}|
    assert(got(2) == 0.0)
  }
}
