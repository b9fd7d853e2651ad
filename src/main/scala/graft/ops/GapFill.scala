package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill + forward fill — the densification pass behind
  * dashboards and feature stores: aggregate to a fixed grain, generate
  * the missing grid points per key, and carry the last observation
  * forward (counts gap-fill to zero; values LOCF).
  *
  * Scale shape: the raw event stream is aggregated FIRST (map-side
  * combined groupBy to key×grain cardinality); the calendar explode and
  * the forward-fill window then run on the aggregated grid — days per
  * key, not events per key — so the per-key ordered window is bounded
  * by the time span regardless of event volume. The calendar comes from
  * each key's own [min, max] span (no global driver-side range).
  */
object GapFill {

  /** Densify `df` to one row per (key, grain) with zero-filled counts
    * and forward-filled values.
    *
    * @param grain  a date_trunc unit ("day", "hour", ...)
    * @param valueCol aggregated per grain with a DECIMAL sum (partition-
    *                 order independent), rounded to 4
    * @return (keyCol, bucket, n_events, filled_value) */
  def forwardFillDaily(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, grain: String = "day"): DataFrame = {
    val step = grain match {
      case "day"  => expr("interval 1 day")
      case "hour" => expr("interval 1 hour")
      case other  => throw new IllegalArgumentException(s"unsupported grain: $other")
    }
    val agg = df
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast("decimal(28,12)")).cast("double"), 4)
          .as("bucket_value"))
    val cal = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"), step)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("bucket_value"), ignoreNulls = true).over(w).as("filled_value"))
  }
}
