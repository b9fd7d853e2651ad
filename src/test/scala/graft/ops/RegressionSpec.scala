package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a known line exactly (y = 2x + 1, r2 = 1)") {
    val df = (0 to 10).map(x => ("g", x.toDouble, 2.0 * x + 1.0))
      .toDF("g", "x", "y")
    val r = Regression.fitPerGroup(df, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("matches the closed-form fit on noisy data, per group") {
    val pts = Seq.tabulate(40) { i =>
      val x = i % 10
      // deterministic "noise" from the index, different per group
      val g = if (i < 20) "a" else "b"
      val y = (if (g == "a") 3.0 else -1.5) * x + ((i * 7) % 5 - 2) * 0.25
      (g, x.toDouble, y)
    }
    val out = Regression.fitPerGroup(pts.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"), scale = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val sub = pts.filter(_._1 == g)
      val n = sub.size.toDouble
      val sx = sub.map(_._2).sum; val sy = sub.map(_._3).sum
      val sxy = sub.map(p => p._2 * p._3).sum
      val sxx = sub.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icpt = (sy - slope * sx) / n
      assert(math.abs(out(g).getAs[Double]("slope") - slope) < 1e-8, g)
      // the intercept publishes at InterceptScale=4 (see Regression's
      // determinism note: DuckDB's two-rounding decimal→double cast
      // bounds its certifiable cross-engine precision), so the
      // closed-form comparison tolerance is the 4-dp half-ulp
      assert(math.abs(out(g).getAs[Double]("intercept") - icpt) < 5e-5 + 1e-8, g)
    }
  }

  test("degenerate groups yield NULL, not errors") {
    val df = Seq(("one", 1.0, 5.0), ("flat", 2.0, 1.0), ("flat", 2.0, 9.0))
      .toDF("g", "x", "y")
    val out = Regression.fitPerGroup(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("one").isNullAt(out("one").fieldIndex("slope")))   // n < 2
    assert(out("flat").isNullAt(out("flat").fieldIndex("slope"))) // var(x)=0
  }

  test("result is partition-order independent") {
    val pts = Seq.tabulate(100)(i => ("g", (i % 13).toDouble, math.sin(i) * 100))
    val a = Regression.fitPerGroup(pts.toDF("g", "x", "y").repartition(7),
      Seq("g"), col("x"), col("y"), scale = 12).collect().head
    val b = Regression.fitPerGroup(
      pts.reverse.toDF("g", "x", "y").repartition(3),
      Seq("g"), col("x"), col("y"), scale = 12).collect().head
    assert(a.getAs[Double]("slope") === b.getAs[Double]("slope"))
    assert(a.getAs[Double]("r2") === b.getAs[Double]("r2"))
  }
}
