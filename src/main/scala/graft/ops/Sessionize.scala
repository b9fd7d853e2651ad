package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session until the inter-event gap exceeds a threshold — the
  * standard segmentation step behind engagement/funnel analytics and
  * behavioral training-data extraction (reference analog: the per-source
  * hour-window batching of `/root/reference/src/utils/reddit_api.py:38-54`
  * generalized to data-driven boundaries).
  *
  * Shape: one window over (key ORDER BY ts) computes the lag gap and the
  * running break-count (= session ordinal) in the SAME partitioning — a
  * single exchange, then a hash agg to session grain. No self-join, no
  * driver state.
  *
  * Determinism with tied timestamps: among rows with equal (key, us) the
  * lag order is engine-dependent, but exactly one of the tied rows sees
  * the gap from the previous distinct timestamp (the others see gap 0),
  * so the break COUNT — and with the SQL-default RANGE frame, every tied
  * row's session ordinal — is order-independent. Session membership and
  * per-session counts/min/max are therefore stable across engines.
  *
  * 100 TB: the per-key ordered scan means one key's events are one
  * task's work; keys here are users (high cardinality, bounded per-key
  * volume). For degenerate keys (a bot with 10⁹ events) shard the window
  * q98-style: (key, day) partials + boundary fix-up across day edges.
  */
object Sessionize {

  /** Event-level frame with a `sess` ordinal per key (0-based). `usCol`
    * must be an integer timestamp (micros) — exact on every engine. */
  def assign(events: DataFrame, keyCol: String, usCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(usCol)
    events
      .withColumn("brk",
        when(col(usCol) - lag(col(usCol), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(w))
      .drop("brk")
  }

  /** Session-grain rollup: events per session, span in micros. */
  def sessions(events: DataFrame, keyCol: String, usCol: String,
      gapUs: Long): DataFrame =
    assign(events, keyCol, usCol, gapUs)
      .groupBy(col(keyCol), col("sess"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col(usCol)) - min(col(usCol))).as("dur_us"))

  /** Per-key rollup over sessions — the analytics-facing summary. All
    * columns integer-exact except the mean (double, rounded). */
  def keyStats(events: DataFrame, keyCol: String, usCol: String,
      gapUs: Long): DataFrame =
    sessions(events, keyCol, usCol, gapUs)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_sess_events"),
        sum(col("dur_us")).as("total_dur_us"),
        round(sum(col("n_ev")).cast("double") / count(lit(1)), 4)
          .as("avg_sess_events"))
}
