package graft.analysis

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // single-machine reference implementation (Sennrich et al. semantics,
  // same deterministic tie-break: count desc, then pair asc)
  private def refTrain(freq0: Map[String, Long], k: Int): Seq[(String, String)] = {
    var words: Seq[(Seq[String], Long)] =
      freq0.toSeq.map { case (w, f) => (w.map(_.toString), f) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    for (_ <- 0 until k if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b))
          words = words.map { case (s, f) => (BpeTrainer.mergeOnce(s, a, b), f) }
        case _ => done = true
      }
    }
    out.toSeq
  }

  private val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
  private def corpus = freq.toSeq.flatMap { case (w, f) =>
    Seq.fill(f.toInt)(w)
  }.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")

  test("distributed train ≡ single-machine reference on the classic corpus") {
    val got = BpeTrainer.train(corpus, "text", numMerges = 6)
    val want = refTrain(freq, 6)
    assert(got == want, s"got $got, want $want")
    // the classic first merges: (e,s) 9 then (es,t) 9 dominate
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")))
  }

  test("encode applies the merge list in training order") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    assert(BpeTrainer.encode("newest", merges) == Seq("n", "e", "w", "est"))
    assert(BpeTrainer.encode("lowest", merges) == Seq("low", "est"))
    assert(BpeTrainer.encode("", merges).isEmpty)
  }

  test("training stops early when no pair repeats") {
    val tiny = Seq("ab cd").toDF("text") // every adjacent pair has count 1
    assert(BpeTrainer.train(tiny, "text", numMerges = 5).isEmpty)
  }

  test("mergeOnce is greedy left-to-right (overlapping runs)") {
    assert(BpeTrainer.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
  }

  test("trainWithStats: merges agree with train and measured invariants hold") {
    val stats = BpeTrainer.trainWithStats(corpus, "text", numMerges = 6)
    assert(stats.map(s => (s.left, s.right)) == refTrain(freq, 6))
    stats.foreach { s =>
      assert(s.pairCount >= 2, s"merge below threshold: $s")
      assert(s.symsAfter < s.symsBefore, s"merge must shrink the corpus: $s")
      assert(s.charsAfter == s.charsBefore, s"merges must conserve chars: $s")
    }
    // rounds chain: each round starts from the previous round's corpus
    stats.sliding(2).foreach {
      case Seq(p, n) => assert(n.symsBefore == p.symsAfter)
      case _ =>
    }
  }

  test("encodeCorpus conserves character mass (n_token_chars = n_word_chars)") {
    val docs = Seq((1L, "newest newest lower"), (2L, "low widest low low"))
      .toDF("doc_id", "text")
    val merges = BpeTrainer.train(corpus, "text", numMerges = 6)
    BpeTrainer.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_token_chars") == r.getAs[Long]("n_word_chars"))
        assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
        assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_word_chars"))
      }
  }

  test("supplementary characters stay whole symbols (code points, not UTF-16 units)") {
    // "😀" (one emoji code point) must be ONE symbol: a
    // code-unit split would produce two invalid lone surrogates, and the
    // code-unit char counts would break conservation against Spark's
    // code-point length().
    val emoji = new String(Character.toChars(0x1F600))
    val syms = BpeTrainer.encode(emoji + "x", Nil)
    assert(syms == Seq(emoji, "x"), s"got ${syms.map(_.length)}-unit symbols $syms")
    assert(syms.forall(s => !s.exists(Character.isSurrogate) || s.codePointCount(0, s.length) == 1))
    val docs = Seq((1L, s"${emoji}x ${emoji}x plain")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", numMerges = 2)
    BpeTrainer.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_token_chars") == r.getAs[Long]("n_word_chars"),
          s"conservation broke on astral text: $r")
      }
  }

  test("encodeCorpus ≡ per-doc reference encode (distinct-word tier is invisible)") {
    val docs = Seq(
      (1L, "newest newest lower"),
      (2L, "low widest low low"),
      (3L, "lowest"), // word unseen at train time still encodes
      (4L, "")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(corpus, "text", numMerges = 6)
    val got = BpeTrainer.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Seq(
      (1L, Seq("newest", "newest", "lower")),
      (2L, Seq("low", "widest", "low", "low")),
      (3L, Seq("lowest"))).map { case (id, ws) =>
      (id, ws.size.toLong,
        ws.map(w => BpeTrainer.encode(w, merges).length.toLong).sum)
    }.toSet
    // doc 4 has no words → no word-count rows → absent (callers outer-join
    // back against the doc table if zero rows must surface)
    assert(got == want, s"got $got, want $want")
  }
}
