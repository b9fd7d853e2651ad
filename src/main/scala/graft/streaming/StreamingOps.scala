package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expressions of the reference's queue/stream
  * semantics (SURVEY.md §2.8 Q1–Q8, W1, W4).
  *
  * The Redis queue/lease/GC machinery (~480 LoC of `rediswq.py` +
  * `redislease.py` + `garbage_collector.py`) is deleted, not ported:
  * Spark's scheduler + checkpointing subsume lease/redelivery (Q1–Q5),
  * and the dedup gate becomes state-store dedup with a watermark TTL.
  *
  * Semantics decision (SURVEY §7.4): the reference's dedup TTL is
  * wall-clock relative to arrival; `dropDuplicatesWithinWatermark` is
  * event-time relative to the max seen timestamp. Within-horizon
  * duplicates are dropped in both; the difference is only when event time
  * lags arrival by more than the horizon — documented, not hidden.
  */
object StreamingOps {

  /** F8/W4 streaming dedup gate: keep-first within a 7-day event-time
    * horizon (Q8: duplicates skipped, never updated; late data accepted
    * any time inside the horizon). */
  def dedupStream(df: DataFrame, tsCol: String, keyCol: String,
                  horizon: String = "7 days"): DataFrame =
    df.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCol)

  /** W1: tumbling 1-hour event counts with a watermark so state is
    * dropped once windows close. */
  def hourlyCounts(df: DataFrame, tsCol: String, keyCol: String,
                   lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col(keyCol), col("n_events"))

  /** Sliding-window counts (width/slide, e.g. 2h every 1h): each event
    * lands in width/slide overlapping windows — the trend-smoothing
    * variant of `hourlyCounts` (same shape batch-side in q73). State per
    * open window is one aggregation buffer; the watermark closes
    * windows, so state is (width/slide) × keys regardless of input
    * volume. */
  def slidingCounts(df: DataFrame, tsCol: String, keyCol: String,
                    width: String = "2 hours", slide: String = "1 hour",
                    lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n_events"))

  /** Gap-based sessionization — the streaming twin of q38's batch
    * lag/cumsum form, expressed with `session_window` so Spark manages
    * session state + merge and the watermark bounds it. */
  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** Live leaderboard: running global top-k by count — the aggregation
    * family where `OutputMode.Complete` is the right tool (sorting and
    * `limit` on a streaming aggregate are ONLY legal in complete mode,
    * and the sink rewrites the whole — small — result each batch). State
    * is one counter per key, never per event, so it is bounded by key
    * cardinality regardless of stream volume; the sort runs over the
    * aggregated counters only. */
  def runningTopK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col(keyCol).asc)
      .limit(k)

  /** J1 in streaming: stream-static broadcast enrichment — the join
    * never shuffles the stream. Refresh caveat: each micro-batch
    * re-executes the static side's PLAN, but a path-based parquet
    * DataFrame snapshots its file LISTING at read time
    * (InMemoryFileIndex), so files added or replaced under the path are
    * never seen — an in-place overwrite makes later batches fail on the
    * deleted files. For a dimension that refreshes mid-stream, re-create
    * the DataFrame per batch inside foreachBatch, or read a catalog
    * table and REFRESH TABLE it (a lakehouse table's log gives this for
    * free). */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream INTERVAL join: pair each left event with right events
    * of the same key whose timestamp lies in [leftTs - lookback, leftTs]
    * — the streaming twin of `ops/AsOfJoin`/`ops/RangeJoin` (e.g. "clicks
    * within 1 hour before the order", the reference's hour-window scrape
    * correlation W1/W3 done online). Both sides carry watermarks and the
    * join condition bounds the time range in BOTH directions, which is
    * exactly what Spark requires to evict join state: right rows older
    * than lookback + lateness are dropped from the state store, so state
    * is bounded at any input rate.
    *
    * Column contract: both inputs must already expose distinct names
    * (rename before calling); `leftTs`/`rightTs` are event-time columns.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         key: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         lookback: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      col(key) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      "inner")
  }
}
