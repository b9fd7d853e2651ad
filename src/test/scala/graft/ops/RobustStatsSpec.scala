package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("flags the planted spike and nothing else") {
    // 99 values in [0, 9.8] plus one spike at 1000
    val vals = Seq.tabulate(99)(i => ("g", (i % 50) * 0.2)) :+ (("g", 1000.0))
    val r = RobustStats.madOutlierStats(vals.toDF("g", "v"), Seq("g"),
      col("v")).collect().head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("med") < 10.0)
  }

  test("median/MAD ignore the outlier's pull (robustness vs mean/stddev)") {
    val base = Seq.tabulate(101)(i => ("g", i.toDouble)) // median 50, MAD 25
    val spiked = base :+ (("g", 1e9))
    val clean = RobustStats.madOutlierStats(base.toDF("g", "v"), Seq("g"),
      col("v")).collect().head
    val dirty = RobustStats.madOutlierStats(spiked.toDF("g", "v"), Seq("g"),
      col("v")).collect().head
    assert(clean.getAs[Double]("med") === 50.0)
    assert(clean.getAs[Double]("mad") === 25.0)
    // one extra extreme point barely moves the robust center/scale
    assert(math.abs(dirty.getAs[Double]("med") - 50.5) < 1e-9)
    assert(math.abs(dirty.getAs[Double]("mad") - 25.5) < 1e-9)
  }

  test("a NULL group key is reported like any other group (null-safe join-back)") {
    // groupBy puts null keys in their own group; the medians/MAD tables
    // have that row, and the join back onto the rows must be null-safe
    // or the whole null group silently vanishes from the output.
    val df = (Seq.tabulate(20)(i => (Some("a"), i * 1.0)) ++
      Seq.tabulate(20)(i => (Option.empty[String], 100.0 + i))).toDF("g", "v")
    val out = RobustStats.madOutlierStats(df, Seq("g"), col("v"))
      .collect().map(r => (Option(r.getString(0)), r.getAs[Long]("n"))).toMap
    assert(out == Map(Some("a") -> 20L, None -> 20L), s"got $out")
  }

  test("groups are independent") {
    val df = (Seq.tabulate(50)(i => ("a", i * 1.0)) ++
      Seq.tabulate(50)(i => ("b", 1000.0 + i))).toDF("g", "v")
    val out = RobustStats.madOutlierStats(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("med")).toMap
    assert(out("a") < 100 && out("b") > 1000)
  }
}
