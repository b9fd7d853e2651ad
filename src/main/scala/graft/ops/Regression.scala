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
  * Determinism across engines: each term (x, y, and the IEEE-exact
  * DOUBLE products x·y, x², y²) is quantized to decimal(28,12) BEFORE
  * summing, so the sums are exact decimals and partition-order
  * independent (a raw double Σxy differs run-to-run under Spark and
  * engine-to-engine vs DuckDB). Products are formed in double, never
  * decimal×decimal — a (28,12)² product needs width 57 and DuckDB
  * refuses past 38. The final divisions run in double off the exact
  * sums — one rounding step, same in both engines. Keep |x|,|y| modest
  * (≤ ~1e7) so quantized products fit 16 integer digits — pass day/hour
  * indexes, not raw epoch seconds.
  *
  * 100 TB: the only exchange carries one row per group; partials combine
  * map-side. Degenerate groups (n < 2 or zero x-variance) yield NULL
  * slope rather than a division error.
  */
object Regression {

  private val Dec = "decimal(28,12)"

  /** Fit y ~ x per group. Output: groupCols..., n, slope, intercept, r2
    * (doubles rounded to `scale` digits). */
  def fitPerGroup(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column, scale: Int = 8): DataFrame = {
    val xd = x.cast("double")
    val yd = y.cast("double")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xd.cast(Dec)).as("sx"), sum(yd.cast(Dec)).as("sy"),
      sum((xd * yd).cast(Dec)).as("sxy"),
      sum((xd * xd).cast(Dec)).as("sxx"),
      sum((yd * yd).cast(Dec)).as("syy"))
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
        round((sy - slope * sx) / n, scale).as("intercept"),
        round(when(col("n") >= 2 && varXN =!= 0d && varYN =!= 0d,
          covN * covN / (varXN * varYN)), scale).as("r2")): _*)
  }
}
