package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq.tabulate(300) { i =>
    (s"k${i % 3}", i % 7, math.sin(i) * 1000)
  }

  test("merge of arbitrary batch splits equals the full recompute") {
    val df = rows.toDF("k", "batch", "v")
    val full = AggState.finalize(
      AggState.partial(df, Seq("k"), col("v")), Seq("k"))
    val parts = (0 until 7).map(b =>
      AggState.partial(df.filter(col("batch") === b), Seq("k"), col("v")))
    val merged = AggState.finalize(
      AggState.merge(Seq("k"), parts: _*), Seq("k"))
    assert(merged.orderBy("k").collect().toSeq ===
      full.orderBy("k").collect().toSeq)
  }

  test("merge keeps keys present in only one input") {
    val a = AggState.partial(Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), col("v"))
    val b = AggState.partial(Seq(("y", 2.0)).toDF("k", "v"), Seq("k"), col("v"))
    val out = AggState.finalize(AggState.merge(Seq("k"), a, b), Seq("k"))
      .orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("x", "y"))
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(1L, 1L))
  }

  test("HLL sketch state obeys the same monoid law (union ≈ global)") {
    // distinct-count state: mergeable sketch instead of exact sum
    val df = Seq.tabulate(5000)(i => (i % 2, s"u${i % 1200}")).toDF("half", "u")
    val parts = df.groupBy("half").agg(hll_sketch_agg(col("u")).as("sk"))
    val unioned = parts.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    assert(math.abs(unioned - 1200L) <= 1200 * 0.05,
      s"union estimate $unioned too far from 1200")
  }
}
