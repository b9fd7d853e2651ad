package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perGroup equals a single global window ranking") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i * 37 % 991, i)).toDF("g", "v", "id")
    val got = TopK.perGroup(df, Seq("g"),
        Seq(col("v").desc, col("id").asc), 5, saltOn = hash(col("id")))
      .select("g", "rn", "id").as[(String, Int, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "rn", "id").as[(String, Int, Int)].collect().toSet
    assert(got == want)
  }

  test("perGroup handles groups smaller than k") {
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq(col("v").desc), 5, saltOn = hash(col("v")))
      .select("g", "rn", "v").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 2), ("a", 2, 1), ("b", 1, 9)))
  }
}
