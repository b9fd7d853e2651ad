package graft.ops

import graft.SparkSpec

class ApportionSpec extends SparkSpec {
  import spark.implicits._

  test("targets sum exactly to the budget and follow sqrt weighting") {
    val counts = Seq(("a", 8100L), ("b", 900L), ("c", 100L))
      .toDF("source", "n_docs")
    val got = Apportion.bySqrtCount(counts, "source", "n_docs", budget = 100L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // weights 90:30:10 → exact shares 69.23 / 23.08 / 7.69
    assert(got.values.sum == 100L)
    assert(got == Map("a" -> 69L, "b" -> 23L, "c" -> 8L))
  }

  test("largest-remainder hands leftover units to the biggest fractions") {
    // equal counts, budget not divisible: 3 sources × 100, budget 10
    val counts = Seq(("x", 100L), ("y", 100L), ("z", 100L))
      .toDF("source", "n_docs")
    val got = Apportion.bySqrtCount(counts, "source", "n_docs", budget = 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // 10/3: fracs tie at .333 → key order gives x the single extra unit
    assert(got.values.sum == 10L)
    assert(got == Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
  }

  test("temperature flattens: small sources get more than proportional share") {
    val counts = Seq(("big", 10000L), ("small", 100L)).toDF("source", "n_docs")
    val got = Apportion.bySqrtCount(counts, "source", "n_docs", budget = 110L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // proportional would give small ~1; sqrt gives 100:10 → 10 units
    assert(got("small") == 10L && got("big") == 100L)
  }
}
