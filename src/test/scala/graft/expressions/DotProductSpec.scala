package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import DotProduct.dot_product
import L2Squared.l2_squared

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with(...)) HOF fold") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(50) { i =>
      (Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      dot_product(col("a"), col("b")).as("nd"), hofDot(col("a"), col("b")).as("hd"),
      l2_squared(col("a"), col("b")).as("nl"), hofL2(col("a"), col("b")).as("hl"))
      .as[(Double, Double, Double, Double)].collect()
    got.foreach { case (nd, hd, nl, hl) =>
      assert(java.lang.Double.doubleToLongBits(nd) == java.lang.Double.doubleToLongBits(hd))
      assert(java.lang.Double.doubleToLongBits(nl) == java.lang.Double.doubleToLongBits(hl))
    }
  }

  test("null array → null; null element → null (HOF parity)") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0), Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(1.0))))
    ).toDF("a", "b")
    val got = df.select(dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(11.0))
    assert(got(1).isEmpty)
    assert(got(2).isEmpty)
  }

  test("length mismatch → null, matching the zip_with pad-with-null fold") {
    // zip_with pads the shorter side with nulls → x*y null → aggregate
    // poisons to null; truncating to the shorter length would instead
    // mask a dimension-mismatch bug as a plausible score.
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val got = df.select(
      dot_product(col("a"), col("b")).as("d"),
      l2_squared(col("a"), col("b")).as("l"),
      hofDot(col("a"), col("b")).as("hd"),
      hofL2(col("a"), col("b")).as("hl")).collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1), s"kernel must null on mismatch: $got")
    assert(got.isNullAt(2) && got.isNullAt(3), "HOF parity reference broken")
  }

  test("l2_normalize declares nullable (null element → null result survives filters)") {
    // Without nullable=true, Catalyst may fold IsNotNull to true and the
    // null row would pass a filter it must not.
    val df = Seq(Tuple1(Seq(Some(1.0), None)), Tuple1(Seq(Some(3.0), Some(4.0))))
      .toDF("a")
    val norm = df.select(L2Normalize.l2_normalize(col("a")).as("v"))
    assert(norm.schema("v").nullable, "l2_normalize must be nullable")
    assert(norm.filter(col("v").isNotNull).count() == 1)
    assert(norm.filter(col("v").isNull).count() == 1)
  }

  test("participates in whole-stage codegen, reading array<float> directly") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(dot_product(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_product.*"), s"plan was:\n$plan")
    assert(df.filter(col("d") > 0).count() > 0)
  }

  test("float arrays widen exactly: equals the transform(cast)-first form") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    val got = df.select(
      dot_product(col("embedding"), col("embedding")).as("direct"),
      hofDot(graft.similarity.Cosine.toDouble(col("embedding")),
             graft.similarity.Cosine.toDouble(col("embedding"))).as("casted"))
      .as[(Double, Double)].collect()
    got.foreach { case (d, c) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(c))
    }
  }

  test("l2_normalize: unit norm, zero vector passes through, division parity") {
    import L2Normalize.l2_normalize
    val df = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(0.0, 0.0))
    ).toDF("id", "v")
    val got = df.select(col("id"), l2_normalize(col("v")).as("n"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) == Seq(3.0 / 5.0, 4.0 / 5.0)) // exact division, not *reciprocal
    assert(got(2L) == Seq(0.0, 0.0))
    // dot of the normalized vector with itself is 1 (to fp)
    val n2 = df.filter(col("id") === 1)
      .select(dot_product(l2_normalize(col("v")), l2_normalize(col("v"))))
      .as[Double].collect()(0)
    assert(math.abs(n2 - 1.0) < 1e-12)
  }

  test("non-array input rejected at analysis") {
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(dot_product(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }
}
