package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregation via mergeable partial state — materialized-
  * view maintenance: keep a small per-key state table (n, Σ, min, max),
  * fold each new partition/day of data into it with a state-MERGE
  * instead of re-scanning history, and finalize metrics (avg, …) only
  * at read time. The algebraic-aggregate discipline: every kept
  * statistic must be commutative-monoid-mergeable, derived metrics
  * (avg) are never stored — storing avg loses mergeability.
  *
  * Determinism: the running sum is decimal(28,12)-quantized per element
  * so merge order (which days arrived in which batches) can never
  * change a digit — the merged state is bit-identical to a full
  * recompute, which is exactly what the q114 oracle asserts.
  *
  * 100 TB: the state table is key-cardinality, the daily delta
  * aggregation is one map-side-combined groupBy over just the new
  * partition, and the merge joins state-sized tables. History is never
  * re-read. (For distinct-count state, swap in a mergeable sketch —
  * HLL union obeys the same monoid law; see AggStateSpec.)
  */
object AggState {

  private val Dec = "decimal(28,12)"

  /** Aggregate `valueCol` into mergeable state per key:
    *  keys..., st_n, st_sum (exact decimal), st_min, st_max */
  def partial(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("st_n"),
      sum(valueCol.cast(Dec)).as("st_sum"),
      min(valueCol).as("st_min"),
      max(valueCol).as("st_max"))

  /** Merge any number of state tables (outer-union semantics: a key
    * present in only some inputs keeps its state). */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("st_n")).as("st_n"),
        sum(col("st_sum")).as("st_sum"),
        min(col("st_min")).as("st_min"),
        max(col("st_max")).as("st_max"))

  /** Finalize read-time metrics off the state. */
  def finalize(state: DataFrame, keys: Seq[String], scale: Int = 6): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("st_n").as("n"),
        round(col("st_sum").cast("double"), scale).as("sum_value"),
        round(col("st_sum").cast("double") / col("st_n").cast("double"), scale)
          .as("avg_value"),
        col("st_min").as("min_value"),
        col("st_max").as("max_value")): _*)
}
