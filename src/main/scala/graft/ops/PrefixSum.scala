package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sum over a GLOBAL total order — the
  * primitive behind running balances, cumulative token budgets, and
  * concurrency curves. The naive `Window.orderBy(ts)` with no partition
  * key collapses the whole table into ONE task; this is the two-phase
  * decomposition that keeps every task bounded:
  *
  *  1. bucket rows by a coarse prefix of the order key (e.g. the day of
  *     a timestamp — any expression that is monotone in the order);
  *  2. per-bucket partial sums (map-side combined, bucket-cardinality
  *     exchange), then ONE tiny window over the bucket totals computes
  *     each bucket's starting offset;
  *  3. an ordinary within-bucket running-sum window (bounded by bucket
  *     width) plus the broadcast offset.
  *
  * Sums are DECIMAL(28,12) casts of the value — exact and associative,
  * so phase decomposition is bit-identical to the sequential fold (and
  * to a DuckDB window oracle) under any partitioning.
  */
object PrefixSum {

  private val Dec = "decimal(28,12)"

  /** Append `outCol` = running sum of `value` over the global order
    * (`bucket` must be monotone in `order`; `order` must be total —
    * include a tiebreaker). */
  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
                 value: Column, outCol: String): DataFrame = {
    val b = df.withColumn("__b", bucket)
    val offsets = b.groupBy(col("__b"))
      .agg(sum(value.cast(Dec)).as("__bs"))
      .withColumn("__off",
        coalesce(sum(col("__bs")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(java.math.BigDecimal.ZERO).cast(Dec)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), "__b")
      .withColumn(outCol, (col("__off") + sum(value.cast(Dec)).over(w)).cast("double"))
      .drop("__b", "__off")
  }
}
