package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/agg-key skew diagnostics — the pre-flight check a pipeline runs
  * BEFORE committing a 100 TB shuffle to a key: per-key count
  * distribution (max, p50/p99), the max/mean skew ratio, and the hot
  * key's share of all rows. Reads: skew ≈ 1 → hash-partitioning is
  * balanced; skew ≫ p99/p50 → one celebrity key will pin a task, reach
  * for `ops/SaltedJoin`, AQE skew handling, or a broadcast instead.
  *
  * Two aggregations: per-key counts (map-side combined, key-cardinality
  * exchange), then a single-row global summary — the audit itself can
  * never be the bottleneck it hunts. Exact percentiles over the count
  * column are key-cardinality sorts; swap `approx_percentile` past
  * ~10⁹ keys. */
object SkewAudit {

  /** One-row distribution audit of `df` grouped by `keyCol`. */
  def audit(df: DataFrame, keyCol: Column): DataFrame = {
    val counts = df.groupBy(keyCol.as("__key")).agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("n_rows"),
      max("cnt").as("max_cnt"),
      round(percentile(col("cnt"), lit(0.5)), 4).as("p50_cnt"),
      round(percentile(col("cnt"), lit(0.99)), 4).as("p99_cnt"),
      round(max("cnt") / (sum("cnt").cast("double") / count(lit(1))), 4)
        .as("skew_ratio"),
      round(max("cnt") / sum("cnt").cast("double"), 6).as("top_key_share"))
  }
}
