package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StrQ2BSpec extends SparkSpec {
  import spark.implicits._

  test("null in → null out (UnaryExpression null contract)") {
    val got = Seq[Option[String]](None, Some("Ａ"))
      .toDF("s").select(StrQ2B.str_q2b(col("s")).as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.sameElements(Array(None, Some("A"))))
  }

  test("participates in whole-stage codegen (not a UDF boundary)") {
    // literal inputs constant-fold at plan time; use a real scan so the
    // expression lands inside a codegen stage
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(StrQ2B.str_q2b(col("text")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in the plan string
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[str_q2b.*"), s"plan was:\n$plan")
    assert(df.count() > 0)
  }

  test("fast path: pure-ASCII input returns without rewrite") {
    val in = "already ascii 123!"
    val out = Seq(in).toDF("s").select(StrQ2B.str_q2b(col("s")).as("r"))
      .as[String].collect()(0)
    assert(out == in)
  }

  test("non-string input is rejected at analysis") {
    val ex = intercept[Exception] {
      Seq(1).toDF("s").select(StrQ2B.str_q2b(col("s"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }
}
