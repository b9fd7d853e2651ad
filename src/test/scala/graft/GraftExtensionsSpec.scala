package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  // Register into the shared session's registry (the extension class
  // feeds the same descriptions through injectFunction at builder time).
  GraftExtensions.functions.foreach { case (ident, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  test("native expressions are SQL-callable after registration") {
    Seq(("Ｈｅｌｌｏ！", Seq(3.0f, 4.0f))).toDF("s", "v").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      """SELECT str_q2b(s) AS q2b,
                dot_product(v, v) AS dp,
                round(l2_squared(v, array(0.0d, 0.0d)), 4) AS l2,
                element_at(l2_normalize(v), 1) AS n0,
                size(char_ngram_hashes(s, 2)) AS nc,
                size(word_ngram_hashes('a b c d', 2)) AS nw
         FROM ext_t""").collect()(0)
    assert(row.getString(0) == "Hello!")
    assert(row.getDouble(1) == 25.0)
    assert(row.getDouble(2) == 25.0)
    assert(row.getDouble(3) == 3.0 / 5.0)
    assert(row.getInt(4) == 5) // "Ｈｅｌｌｏ！" has 5 distinct char 2-grams
    assert(row.getInt(5) == 3)
  }

  test("sketch + fingerprint kernels are SQL-callable and match their Column forms") {
    import graft.analysis.TextAnalysis
    import graft.text.TextOps
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(text).toDF("s").createOrReplaceTempView("ext_s")
    val row = spark.sql(
      """SELECT size(minhash_sig(word_ngram_hashes(s, 3), 16)) AS nm,
                simhash48(split(s, ' '), 48) AS sh,
                poly_fingerprint(s) AS fp,
                size(word_gram_keys(s, 5)) AS ng
         FROM ext_s""").collect()(0)
    assert(row.getInt(0) == 16)
    val (fpCol, ngCol) = Seq(text).toDF("s").select(
        TextAnalysis.fingerprint(col("s")).as("fp"),
        size(graft.expressions.WordGramKeys.word_gram_keys(col("s"), 5)).as("ng"))
      .as[(Long, Int)].collect()(0)
    assert(row.getLong(2) == fpCol)
    assert(row.getInt(3) == ngCol && ngCol == 4) // 8 tokens -> 4 windows
    assert(row.getLong(1) == Seq(text).toDF("s").select(
      graft.expressions.SimHash48.simhash48(split(col("s"), " "), 48))
      .as[Long].collect()(0))
  }

  test("sq8_sim is SQL-callable and matches its Column form") {
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f), Array(0.0, 0.0), Array(8.0, 8.0)))
      .toDF("q", "v", "mn", "mx")
    df.createOrReplaceTempView("ext_sq8")
    val sql = spark.sql("SELECT sq8_sim(q, v, mn, mx) AS s FROM ext_sq8")
      .collect()(0).getDouble(0)
    val col0 = df.select(graft.expressions.Sq8Sim.sq8_sim(
      col("q"), col("v"), col("mn"), col("mx")).as("s")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(sql) ==
      java.lang.Double.doubleToLongBits(col0))
  }

  test("non-literal k is rejected with a helpful error") {
    Seq(("abc", 2)).toDF("s", "k").createOrReplaceTempView("ext_k")
    val ex = intercept[Exception] {
      spark.sql("SELECT char_ngram_hashes(s, k) FROM ext_k").collect()
    }
    assert(ex.getMessage.contains("literal integer"))
  }

  test("EVERY registry entry has a passing SQL invocation (enumerated parity)") {
    // Key-set equality makes this spec fail when a function is added to
    // GraftExtensions without SQL coverage here (or covered here without
    // being registered) — the registry can never drift untested.
    val calls: Map[String, String] = Map(
      "str_q2b" -> "str_q2b('Ｈｉ！') = 'Hi!'",
      "dot_product" -> "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) = 11.0d",
      "l2_squared" -> "l2_squared(array(0.0d, 0.0d), array(3.0d, 4.0d)) = 25.0d",
      "l2_normalize" -> "element_at(l2_normalize(array(3.0d, 4.0d)), 1) = 0.6d",
      "char_ngram_hashes" -> "size(char_ngram_hashes('abcd', 2)) = 3",
      "word_ngram_hashes" -> "size(word_ngram_hashes('a b c d', 2)) = 3",
      "minhash_sig" -> "size(minhash_sig(word_ngram_hashes('a b c d e', 2), 8)) = 8",
      "simhash48" -> "simhash48(array('a', 'b'), 8) IS NOT NULL",
      "poly_fingerprint" -> "poly_fingerprint('a b c') IS NOT NULL",
      "word_gram_keys" -> "size(word_gram_keys('a b c d e f', 3)) = 4",
      "word_gram_strings" -> "element_at(word_gram_strings('a b c d', 3), 2) = 'b c d'",
      // zero-span dims reconstruct to mn exactly: 2 * (7 + 0) = 14
      "sq8_sim" -> "sq8_sim(array(2.0d), array(123.0d), array(7.0d), array(7.0d)) = 14.0d",
      // {1,2,3} vs {2,3,4}: 2 common of 4 total
      "jaccard_sim" -> "jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L)) = 0.5d",
      "set_intersect_size" -> "set_intersect_size(array('a', 'b', 'b'), array('b', 'c')) = 1",
      // 65537 truncates to low 16 bits = 1
      "trunc_hashes" -> "element_at(trunc_hashes(array(65537L), 16), 1) = 1S",
      "jaccard_upper" ->
        "jaccard_upper(trunc_hashes(array(1L, 2L, 3L), 16), trunc_hashes(array(2L, 3L, 4L), 16)) = 0.5d",
    )
    val registered = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(registered == calls.keySet,
      s"registry/coverage drift: only-registered=${registered -- calls.keySet} " +
        s"only-covered=${calls.keySet -- registered}")
    calls.foreach { case (name, pred) =>
      assert(spark.sql(s"SELECT $pred AS ok").collect()(0).getBoolean(0),
        s"SQL invocation failed for $name: $pred")
    }
  }

  test("literal-k rejection covers every k-taking registry function") {
    Seq(("abc", 2)).toDF("s", "k").createOrReplaceTempView("ext_k2")
    Seq(
      "char_ngram_hashes(s, k)",
      "word_ngram_hashes(s, k)",
      "minhash_sig(array(CAST(1 AS BIGINT)), k)",
      "simhash48(array('a'), k)",
      "word_gram_keys(s, k)",
      "word_gram_strings(s, k)",
      "trunc_hashes(array(CAST(1 AS BIGINT)), k)",
    ).foreach { call =>
      val ex = intercept[Exception] {
        spark.sql(s"SELECT $call FROM ext_k2").collect()
      }
      assert(ex.getMessage.contains("literal integer"),
        s"non-literal k must be an analysis error for: $call")
    }
  }

  test("ApproxDistinctRewrite: flag flips exact distinct counts to HLL++, schema unchanged") {
    import graft.plans.ApproxDistinctRewrite
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ ApproxDistinctRewrite
    try {
      val df = (1 to 1000).map(i => (i % 137, s"u${i % 211}")).toDF("g", "u")
      def q() = df.groupBy("g").agg(
        countDistinct(col("u")).as("nd"), count(lit(1)).as("n"))

      // flag off: rule is inert, result exact
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
      val exact = q().agg(max("nd")).as[Long].collect()(0)
      assert(exact == 8) // 1000 rows, 137 groups, 211 users: ≤ 8 per group
      assert(!q().queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))

      // flag on: optimized plan carries the sketch, name/type/values hold
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
      val approx = q()
      assert(approx.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      assert(approx.schema("nd").dataType.typeName == "long")
      // tiny cardinalities: HLL++ is exact well below its sparse threshold
      assert(approx.agg(max("nd")).as[Long].collect()(0) == exact)
    } finally {
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
      spark.experimental.extraOptimizations = prev
    }
  }
}
