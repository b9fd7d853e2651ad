package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RidgeProbeSpec extends SparkSpec {
  import spark.implicits._

  private def feats(rows: Seq[(Double, Double, Double)]): DataFrame =
    rows.toDF("x1", "x2", "y")

  // Deterministic pseudo-random features (no Math.random in tests).
  private def synth(n: Int): Seq[(Double, Double, Double)] =
    (1 to n).map { i =>
      val x1 = (i * 37 % 101) / 10.0
      val x2 = (i * 53 % 89) / 10.0
      (x1, x2, 2.0 + 0.5 * x1 - 1.25 * x2)
    }

  test("lambda=0 recovers a noiseless linear teacher exactly") {
    val w = RidgeProbe.fit(feats(synth(200)), "0.0")
      .collect()(0)
    assert(math.abs(w.getDouble(0) - 2.0) < 1e-8)
    assert(math.abs(w.getDouble(1) - 0.5) < 1e-8)
    assert(math.abs(w.getDouble(2) + 1.25) < 1e-8)
  }

  test("ridge penalty shrinks the weight norm") {
    val f = feats(synth(200))
    def norm2(lambdaSql: String): Double = {
      val w = RidgeProbe.fit(f, lambdaSql).collect()(0)
      w.getDouble(0) * w.getDouble(0) + w.getDouble(1) * w.getDouble(1) +
        w.getDouble(2) * w.getDouble(2)
    }
    assert(norm2("1000.0") < norm2("0.0"))
  }

  test("weights are bit-identical under any partitioning (decimal Gram)") {
    val rows = synth(500)
    val a = RidgeProbe.fit(feats(rows), "1.0").collect()(0)
    val b = RidgeProbe.fit(feats(rows).repartition(7), "1.0").collect()(0)
    val c = RidgeProbe.fit(feats(rows.reverse).repartition(3), "1.0").collect()(0)
    for (i <- 0 until 3) {
      assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(i)))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(c.getDouble(i)))
    }
  }

  test("score appends pred/resid consistent with the fitted weights") {
    val f = feats(synth(50))
    val scored = RidgeProbe.score(f, "0.0")
    // Noiseless teacher + lambda=0 → residuals are numerically zero.
    val worst = scored.agg(max(abs(col("resid")))).collect()(0).getDouble(0)
    assert(worst < 1e-8)
    // pred + resid == y by construction.
    val recon = scored
      .agg(max(abs(col("y") - (col("pred") + col("resid"))))).collect()(0).getDouble(0)
    assert(recon < 1e-12)
  }

  test("fit plan is collect-free: one aggregate, no driver loop") {
    // The whole fit (Gram + Cramer solve) must be ONE declarative plan —
    // assert it survives explain without materializing anything.
    val plan = RidgeProbe.fit(feats(synth(50)), "1.0")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate") || plan.toLowerCase.contains("agg"))
  }
}
