package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.{LangId, TextOps}

class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def toks = TextOps.tokens(col("s"))

  test("LangId.predict: stopword profiles pick the right language, 'und' fallback") {
    val got = Seq(
      "the cat sat on a mat and purred",   // en
      "der hund und die katze ist da",     // de
      "el gato es una maravilla que salta",// es
      "le chat est dans les arbres et",    // fr
      "xylophone zebra quartz",            // no stopwords → und
    ).toDF("s").select(LangId.predict(toks).as("r")).as[String].collect()
    assert(got.sameElements(Array("en", "de", "es", "fr", "und")))
  }

  test("LangId: NULL text classifies as 'und', never the last profile") {
    // Pre-fix, size(filter(null, …)) made every cascade condition null
    // and the fold fell through to its innermost seed — the LAST profile
    // ('fr') — so null docs were confidently labeled French.
    val df = Seq(Option.empty[String], Some("the cat and the hat")).toDF("s")
    val word = df.select(LangId.predict(toks).as("r")).as[String].collect()
    assert(word.sameElements(Array("und", "en")), word.mkString(","))
    val char = df.select(LangId.predictCharNgram(col("s")).as("r"))
      .as[String].collect()
    assert(char(0) == "und", s"null text char-ngram: ${char(0)}")
  }

  test("ngramNovelty: copies score 0, fresh docs 1, partial overlap in between") {
    val d = Seq(
      (1L, "a b c d e f"),       // 6 tokens → grams "a b c d e", "b c d e f"
      (2L, "a b c d e f"),       // exact copy of 1 → novelty 0
      (3L, "p q r s t u v"),     // 7 fresh tokens → 3 novel grams
      (4L, "a b c d e f g")      // shares both of doc 1's grams, adds 1
    ).toDF("doc_id", "text")
    val m = TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 5)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, g, n, f) => id -> ((g, n, f)) }.toMap
    assert(m(1L) == ((2L, 2L, 1.0)))
    assert(m(2L) == ((2L, 0L, 0.0)))
    assert(m(3L) == ((3L, 3L, 1.0)))
    assert(m(4L) == ((3L, 1L, 0.3333)))
  }

  test("LangId tie resolves in profile order (en first)") {
    // 'a' is en-profile; 'es' is es-profile — one hit each → en wins
    val got = Seq("a es").toDF("s").select(LangId.predict(toks).as("r")).as[String].collect()(0)
    assert(got == "en")
  }

  test("LangId.predictCharNgram: trigram profiles (Cavnar–Trenkle shape) via the hash kernel") {
    val got = Seq(
      "the king and the queen of england",   // ' th','the','and',' of'...
      "der fischer und sein schiff",         // 'der','und','sch','ich'
      "la casa que tiene la calidad",        // ' la','la ','que',' qu'
      "zzz qqq kkk",                         // nothing → und
    ).toDF("s").select(LangId.predictCharNgram(col("s")).as("r")).as[String].collect()
    assert(got(0) == "en", got.mkString(","))
    assert(got(1) == "de", got.mkString(","))
    assert(got(2) == "es", got.mkString(","))
    assert(got(3) == "und", got.mkString(","))
  }

  test("qualityScore is bounded and ranks clean text above punct soup") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running along the road",
      "!!! ??? ### $$$ %%% ^^^ &&& *** ((()))",
    ).toDF("s").select(TextAnalysis.qualityScore(col("s"), Seq("the", "and")).as("q"))
      .as[Double].collect()
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq("alpha beta", "beta alpha", "alpha beta")
      .toDF("s").select(TextAnalysis.fingerprint(col("s")).as("f")).as[Long].collect()
    assert(fps(0) != fps(1)) // rolling hash sees order
    assert(fps(0) == fps(2))
  }

  test("PolyFingerprint kernel ≡ the declarative HOF fold (incl. unicode/ws edges)") {
    val inputs = Seq(
      "alpha beta gamma", "  leading and trailing  ", "one",
      "", "   ", "tabs\tand\nnewlines\rmixed\fhere",
      "unicode héllo wörld 中文 टोकन emoji🙂 end",
      (1 to 200).map(i => s"tok$i").mkString(" "))
    val both = inputs.toDF("s").select(
      TextAnalysis.fingerprint(col("s")).as("k"),
      TextAnalysis.fingerprintHof(col("s")).as("h"))
      .as[(Long, Long)].collect()
    both.zip(inputs).foreach { case ((k, h), in) =>
      assert(k == h, s"kernel $k != hof $h for input '$in'")
    }
  }

  test("WordGramKeys kernel ≡ gramKeys over transform'd md5 hashes") {
    import graft.text.TextOps
    val inputs = Seq(
      "a b c d e f g h i j",     // > n windows
      "a b c d e",               // exactly n
      "a b c",                   // < n → whole-doc fold
      "solo", "", "   ",         // 1 / 0 tokens
      "dup dup dup dup dup dup", // identical windows → dedup
      "unicode héllo wörld 中文 টোকেন mixed in here")
    val both = inputs.toDF("s").select(
      graft.expressions.WordGramKeys.word_gram_keys(col("s"), 5).as("k"),
      TextAnalysis.gramKeys(
        transform(TextOps.tokens(col("s")), t => TextOps.md5Int32(t)), 5).as("h"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.zip(inputs).foreach { case ((k, h), in) =>
      assert(k == h, s"kernel $k != spec $h for input '$in'")
    }
  }

  test("WordGramKeys kernel at n = 12 equals the WRAPPING fold (weights beyond " +
       "double precision; declarative form overflows under ANSI here)") {
    // Two traps meet at large n: (1) 31^11 > 2^53, so a math.pow-derived
    // weight table is inexact from n = 12 — the kernel now builds
    // weights by integer multiplication, keeping its weighted sum equal
    // to its own wrapping whole-doc fold at ANY n; (2) the declarative
    // gramKeys mirror can't even express this regime — under ANSI
    // (Spark 4 default) its h * 31^(n-1) products raise
    // ARITHMETIC_OVERFLOW from roughly n = 8 with 32-bit hashes — so
    // the reference here is an in-JVM wrapping fold over the same
    // md5Int32 token hashes, not the Column form.
    import graft.text.TextOps
    val n = 12
    val inputs = Seq(
      (1 to 20).map(i => s"tok$i").mkString(" "), // > n windows
      (1 to 12).map(i => s"w$i").mkString(" "),   // exactly n
      "short doc")                                // < n → whole-doc fold
    val rows = inputs.toDF("s").select(
      graft.expressions.WordGramKeys.word_gram_keys(col("s"), n).as("k"),
      transform(TextOps.tokens(col("s")), t => TextOps.md5Int32(t)).as("h"))
      .as[(Seq[Long], Seq[Long])].collect()
    def foldKeys(hs: Seq[Long]): Seq[Long] =
      if (hs.length < n) Seq(hs.foldLeft(0L)((acc, h) => acc * 31 + h))
      else hs.sliding(n).map(_.foldLeft(0L)((acc, h) => acc * 31 + h)).toSeq.distinct
    rows.zip(inputs).foreach { case ((k, h), in) =>
      assert(k == foldKeys(h), s"kernel $k != wrapping fold ${foldKeys(h)} for '$in'")
    }
  }

  test("WordGramStrings kernel ≡ declarative split/transform/concat_ws chain") {
    val inputs = Seq(
      "a b c d e f g h i j",
      "a b c",                   // exactly n
      "a b",                     // < n → empty
      "solo", "", "  \t ",
      "x y x y x y",             // identical windows → dedup
      "unicode héllo wörld 中文 টোকেন mixed in here",
      "  leading and\ttrailing   whitespace\n runs ")
    val n = 3
    val ws = filter(split(trim(col("s")), "\\s+"), w => length(w) > 0)
    val declarative = when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
    val both = inputs.toDF("s").select(
      graft.expressions.WordGramStrings.word_gram_strings(col("s"), n).as("k"),
      declarative.as("h"))
      .as[(Seq[String], Seq[String])].collect()
    both.zip(inputs).foreach { case ((k, h), in) =>
      assert(k == h, s"kernel $k != spec $h for input '$in'")
    }
  }

  test("property: kernels ≡ HOF specs on random unicode strings (ScalaCheck)") {
    import org.scalacheck.Gen
    import graft.text.TextOps
    val params = Gen.Parameters.default
    // mix whitespace-heavy unicode strings with plain ascii
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t"),
        Gen.const("héllo"), Gen.const("中文词"), Gen.const("\n"))).map(_.mkString))
    val samples = (1 to 60).flatMap(i =>
      gen.apply(params, org.scalacheck.rng.Seed(9000L + i)))
    val n = 3
    val ws3 = filter(split(trim(col("s")), "\\s+"), w => length(w) > 0)
    val gsSpec = when(size(ws3) >= n,
      array_distinct(transform(sequence(lit(0), size(ws3) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws3, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
    val rows = samples.toDF("s").select(
      TextAnalysis.fingerprint(col("s")).as("fpK"),
      TextAnalysis.fingerprintHof(col("s")).as("fpH"),
      graft.expressions.WordGramKeys.word_gram_keys(col("s"), 3).as("gk"),
      TextAnalysis.gramKeys(
        transform(TextOps.tokens(col("s")), t => TextOps.md5Int32(t)), 3).as("gh"),
      graft.expressions.WordGramStrings.word_gram_strings(col("s"), 3).as("gsK"),
      gsSpec.as("gsH"))
      .as[(Long, Long, Seq[Long], Seq[Long], Seq[String], Seq[String])].collect()
    rows.zip(samples).foreach { case ((fpK, fpH, gk, gh, gsK, gsH), in) =>
      assert(fpK == fpH, s"fingerprint mismatch for '${in.take(60)}'")
      assert(gk == gh, s"gramKeys mismatch for '${in.take(60)}'")
      assert(gsK == gsH, s"gramStrings mismatch for '${in.take(60)}'")
    }
  }

  test("PolyFingerprint and WordGramKeys participate in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.expressions.PolyFingerprint.poly_fingerprint(col("text")).as("fp"),
        graft.expressions.WordGramKeys.word_gram_keys(col("text"), 5).as("gk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[poly_fingerprint.*"), s"plan was:\n$plan")
    assert(df.count() > 0)
  }

  test("bpeTokenCount segments like a GPT-2 pre-tokenizer") {
    val got = Seq("don't stop 123!!").toDF("s")
      .select(TextAnalysis.bpeTokens(col("s")).as("t")).as[Seq[String]].collect()(0)
    assert(got == Seq("don", "'t", " stop", " 123", "!!"))
  }

  test("HLL and approx-percentile sketches track exact values (q58's contract)") {
    val df = (1 to 5000).map(i => (s"tok${i % 1234}", i.toLong)).toDF("t", "n")
    val (approxD, exactD) = df
      .select(approx_count_distinct(col("t"), rsd = 0.01).as("a"),
        countDistinct(col("t")).as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL $approxD vs exact $exactD")
    val (p50, exact50) = df
      .select(percentile_approx(col("n"), lit(0.5), lit(10000)).as("p"),
        expr("percentile(n, 0.5)").cast("long").as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(p50 - exact50) <= 2, s"approx p50 $p50 vs exact $exact50")
  }
}
