package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining: what follows what. The user-journey
  * complement of [[Sessionize]] — sessions segment the stream, these
  * ops read the order INSIDE it (next-action prediction features,
  * funnel discovery, anomalous-flow detection).
  *
  * Shape: one window per op, partitioned by the sequence key and
  * ordered by (timestamp, tiebreaker) — `lead` is evaluated inside the
  * same exchange, then everything collapses to type- or path-grain
  * aggregates (map-side combined; the output cardinality is |types|² or
  * the path count, never event-scale).
  *
  * Determinism: the order key MUST include a unique tiebreaker —
  * unlike [[Sessionize]] (where tied rows provably cannot change the
  * rollup) a `lead` chain under tied timestamps is genuinely
  * order-dependent, so (ts, event_id) it is, in the engine and in the
  * oracle.
  *
  * 100 TB: same contract as Sessionize — one key's events are one
  * task's sort; shard degenerate keys (key, day) with boundary fix-up.
  */
object Sequences {

  /** First-order transition matrix between consecutive event types:
    * (from, to, n, prob) where prob is row-normalized over `from`. The
    * normalizing window runs over the |types|²-sized aggregate, not the
    * events. */
  def transitions(events: DataFrame, keyCol: String, orderCols: Seq[String],
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val counts = events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy("from_type")
    counts
      .withColumn("prob", round(col("n") * lit(1.0) / sum("n").over(norm), 4))
  }

  /** Top-k length-3 paths of consecutive event types across all keys —
    * funnel discovery. Global top-k lowers to per-partition
    * TakeOrdered + merge (no single-task sort of the full path
    * histogram); ties at the cut break by path text. */
  def topPaths(events: DataFrame, keyCol: String, orderCols: Seq[String],
      typeCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    events
      .withColumn("__t2", lead(col(typeCol), 1).over(w))
      .withColumn("__t3", lead(col(typeCol), 2).over(w))
      .filter(col("__t2").isNotNull && col("__t3").isNotNull)
      .select(concat_ws(">", col(typeCol), col("__t2"), col("__t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }
}
