package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("reports train docs sharing an n-gram with eval, with exact counts") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // shares the eval 3-grams
      (2L, "one two three four five"),         // clean
      (3L, "zz alpha beta gamma yy")           // shares one 3-gram window
    ).toDF("id", "text")
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")

    val out = BloomDecontaminate.contaminationReport(train, eval, "id", "text", n = 3)
      .orderBy("id").as[(Long, Long)].collect()
    // eval 3-grams: {a b g, b g d}; doc1 contains both, doc3 one, doc2 none
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("bloom false positives cannot reach the output (exact verify)") {
    // tiny filter + high fpp forces false positives through the bloom;
    // the semi-join must still produce an exact result
    val train = (1L to 300L).map(i => (i, s"tok${i}a tok${i}b tok${i}c tok${i}d"))
      .toDF("id", "text")
    val eval = Seq((0L, "tok1a tok1b tok1c tok1d")).toDF("id", "text")
    val out = BloomDecontaminate.contaminationReport(train, eval, "id", "text",
        n = 3, expectedEvalNgrams = 4L, fpp = 0.5)
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("bloom probe is a native codegen expression, not a UDF") {
    val train = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
    val eval = Seq((9L, "alpha beta gamma")).toDF("id", "text")
    val df = BloomDecontaminate.contaminationReport(train, eval, "id", "text", n = 3)
    val physical = df.queryExecution.executedPlan.toString
    // the probe must ride the scan inside whole-stage codegen: Spark's
    // BloomFilterMightContain, with no ScalaUDF / BatchEvalPython node
    assert(physical.contains("might_contain"), physical.take(2000))
    assert(!physical.contains("UDF"), physical.take(2000))
  }
}
