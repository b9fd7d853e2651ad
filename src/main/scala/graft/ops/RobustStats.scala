package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Median-absolute-deviation outlier detection per group — the robust
  * z-score every metrics pipeline runs where mean/stddev break: one
  * extreme value drags a classical z-score's own baseline, while the
  * median and MAD have a 50% breakdown point.
  *
  *   outlier(x) ⇔ |x − median| > k · 1.4826 · MAD,
  *   MAD = median(|x − median(x)|)
  *
  * (1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ under normality, so k=3 reads
  * as "3 robust sigmas".)
  *
  * Two exact-percentile aggregations with a broadcast join back between
  * them — medians are order statistics, so unlike [[Regression]] there
  * is no one-pass sufficient-statistic form:
  *   pass 1: per-group median (exchange carries one row per group)
  *   join:   group medians broadcast back onto the rows (no shuffle)
  *   pass 2: per-group MAD of |x − median|, same shape
  *   join + filter: flag rows beyond the fence
  * 100 TB: rows shuffle at most twice on the group key (and not at all
  * if the source is already partitioned by it); the medians/MAD tables
  * are group-cardinality and always broadcast. For corpora where exact
  * per-group sort is too hot, swap `percentile` for `approx_percentile`
  * (t-digest, mergeable) — flags within sketch error of exact.
  */
object RobustStats {

  /** Per-group robust stats + outlier tally. Output: groupCols..., n,
    * med, mad, n_outliers (med/mad rounded to `scale`). */
  def madOutlierStats(df: DataFrame, groupCols: Seq[String], x: Column,
                      k: Double = 3.0, scale: Int = 6): DataFrame = {
    val g = groupCols.map(col)
    // The joins back onto the rows must be NULL-SAFE on the group keys:
    // groupBy puts null-keyed rows in their own group (so meds/mads have
    // a null-group row), but a plain equi-join never matches it back —
    // the null group would silently vanish from the output instead of
    // being reported the way a plain groupBy reports it.
    def joinBack(rows: DataFrame, agg: DataFrame, aggCol: String): DataFrame = {
      val renamed = agg.select(
        groupCols.map(c => col(c).as(s"__g_$c")) :+ col(aggCol): _*)
      rows.join(broadcast(renamed),
          groupCols.map(c => col(c) <=> col(s"__g_$c"))
            .foldLeft(lit(true))(_ && _))
        .drop(groupCols.map(c => s"__g_$c"): _*)
    }
    val meds = df.groupBy(g: _*)
      .agg(percentile(x, lit(0.5)).as("__med"))
    val withMed = joinBack(df, meds, "__med")
    val mads = withMed.groupBy(g: _*)
      .agg(percentile(abs(x - col("__med")), lit(0.5)).as("__mad"))
    joinBack(withMed, mads, "__mad")
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__med")), scale).as("med"),
        round(first(col("__mad")), scale).as("mad"),
        sum(when(abs(x - col("__med")) > lit(k * 1.4826) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
