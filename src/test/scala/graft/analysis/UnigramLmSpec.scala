package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the the the the"),       // all high-probability tokens
    (2L, "the quark zyzzyva the"), // rare tokens → higher NLL
    (3L, "the the quark the")
  ).toDF("id", "text")

  test("model assigns lower NLL to frequent tokens") {
    val m = UnigramLm.train(docs, "text")
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(m("the") < m("quark"))
    // quark appears twice, zyzzyva once → quark strictly more probable
    assert(m("quark") < m("zyzzyva"))
  }

  test("rare-token documents score higher average NLL") {
    val s = UnigramLm.score(docs, "id", "text",
        UnigramLm.train(docs, "text"), java.math.BigDecimal.ZERO)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) < s(3L) && s(3L) < s(2L))
  }

  test("score is partition-order independent (decimal summation)") {
    val model = UnigramLm.train(docs, "text")
    val a = UnigramLm.score(docs, "id", "text", model, java.math.BigDecimal.ZERO)
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    val b = UnigramLm.score(docs.repartition(7), "id", "text", model,
        java.math.BigDecimal.ZERO)
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(a == b)
  }

  test("unknown tokens fall back to the provided unseen NLL") {
    val model = UnigramLm.train(docs, "text")
    val unseen = new java.math.BigDecimal("9.999999999999")
    val out = UnigramLm.score(Seq((9L, "xenolith")).toDF("id", "text"),
        "id", "text", model, unseen)
      .collect().head
    assert(math.abs(out.getDouble(2) - 10.0) < 0.001)
  }
}
