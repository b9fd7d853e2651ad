package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fit as ONE hash aggregation of
  * sufficient statistics — the distributed form of `regr_slope`/
  * `regr_intercept`/`regr_r2`: slope, intercept and R² are pure
  * arithmetic over (n, Σx, Σy, Σxy, Σx², Σy²), so a trend over a
  * billion points per group costs exactly one map-side-combined
  * groupBy. No window, no sort, no per-group iteration.
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *   R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * Determinism across engines: INPUTS are quantized to decimal(18,6)
  * and the products x·y, x², y² are formed in DECIMAL ((18,6)² →
  * (37,12), inside both engines' 38-digit cap), so every sufficient
  * statistic is exact integer arithmetic — partition-order independent
  * AND engine-exact at any magnitude the widths admit. The previous
  * form (double products cast to decimal(28,12)) looked equivalent but
  * was not: DuckDB casts double→decimal by MULTIPLYING IN DOUBLE, so
  * once |v|·10¹² exceeds 2⁵³ the cast's low digits are noise while
  * Spark's cast is exact — the ×30 oracle run (round 14) caught q111's
  * intercept drifting in the 8th decimal from exactly this (day_value²
  * ≈ 1e12 → cast noise ≈ 2e-4/term). The scale-6 input quantization
  * keeps the cast inside double-exact range for |v| ≤ ~9e9 and is a
  * stated granularity contract, mirrored in the oracle. The final
  * divisions run in double off the exact sums. Keep |x|,|y| within
  * ~9e9 — the (18,6) width physically admits ~1e11, but above ~9e9
  * (2⁵³/10⁶) the quantization cast itself re-enters DuckDB's
  * double-multiply noise zone, so ~9e9 is the certified input bound —
  * pass day/hour indexes, not raw epoch seconds.
  *
  * Output precision is part of the contract: slope and R² are RATIOS
  * (sum magnitudes cancel) and certify at 8 dp, but the INTERCEPT
  * carries the absolute magnitude of y — and the one rounding the
  * engines do NOT share is the exact-sum decimal→double conversion:
  * DuckDB converts an int128-backed decimal by rounding the int128 to
  * double FIRST and then dividing by 10^scale (two roundings; measured
  * 1 ulp high on Σxy = 433275743.4 at ×30), while Spark's conversion
  * is correctly rounded. The resulting ~1-ulp sum perturbation moves a
  * 1e6-magnitude intercept by ~4e-10 — invisible at 4 dp (tie window
  * 5e-5) but a coin flip at 8 dp. So the intercept publishes at
  * [[InterceptScale]] = 4.
  *
  * 100 TB: the only exchange carries one row per group; partials combine
  * map-side. Degenerate groups (n < 2 or zero x-variance) yield NULL
  * slope rather than a division error.
  */
object Regression {

  private val DecIn = "decimal(18,6)"

  /** See the determinism note above: the intercept's certifiable
    * cross-engine precision is bounded by DuckDB's two-step
    * decimal→double conversion, not by the exact sums. */
  val InterceptScale = 4

  /** Fit y ~ x per group. Output: groupCols..., n, slope, intercept, r2.
    * slope and r2 are doubles rounded to `scale` digits; the intercept
    * ALWAYS publishes at the fixed [[InterceptScale]] = 4 regardless of
    * `scale` (see the cross-engine precision note above). */
  def fitPerGroup(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column, scale: Int = 8): DataFrame = {
    val xq = x.cast("double").cast(DecIn)
    val yq = y.cast("double").cast(DecIn)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xq).as("sx"), sum(yq).as("sy"),
      sum(xq * yq).as("sxy"),
      sum(xq * xq).as("sxx"),
      sum(yq * yq).as("syy"))
    val n = col("n").cast("double")
    val Seq(sx, sy, sxy, sxx, syy) =
      Seq("sx", "sy", "sxy", "sxx", "syy").map(c => col(c).cast("double"))
    val covN = n * sxy - sx * sy      // n²·cov
    val varXN = n * sxx - sx * sx     // n²·var(x)
    val varYN = n * syy - sy * sy
    val slope = when(col("n") >= 2 && varXN =!= 0d, covN / varXN)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        round(slope, scale).as("slope"),
        round((sy - slope * sx) / n, InterceptScale).as("intercept"),
        round(when(col("n") >= 2 && varXN =!= 0d && varYN =!= 0d,
          covN * covN / (varXN * varYN)), scale).as("r2")): _*)
  }
}
