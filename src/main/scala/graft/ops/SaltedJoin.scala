package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by salting (SURVEY §7.4's "skewed tickers"
  * hazard: AAPL/TSLA dominate the exploded ticker join at scale).
  *
  * A shuffle equi-join places every row of one key on one task; a hot
  * key becomes a straggler. Salting splits each fact key into
  * `numSalts` sub-keys and replicates the matching dimension row to all
  * of them — hot keys now spread over `numSalts` tasks, at the cost of
  * a `numSalts`× blow-up of the (small) dimension side only.
  *
  * When to use which tool:
  *  - dim fits in memory → `broadcast(dim)` (no shuffle at all);
  *  - sort-merge join skew → AQE `skewJoin` splits oversized partitions
  *    automatically (on by default; handles most cases);
  *  - dim too big to broadcast but replicable, or the skew feeds a
  *    downstream aggregation AQE can't re-split → this salted join.
  */
object SaltedJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `numSalts` ways.
    * `saltOn` must be deterministic per fact row (e.g. `hash` of a
    * unique id) so retries land identically. */
  def join(fact: DataFrame, dim: DataFrame, key: String, numSalts: Int,
           saltOn: Column): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(saltOn, lit(numSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-strategy router — `ops/SkewAudit`'s pre-flight wired into a
    * decision, the join-side twin of `AsOfJoin.backwardAuto`: probe the
    * dim's size and the fact's hottest key share with two cheap agg
    * jobs, then route to `broadcast(dim)` (dim fits), the salted join
    * (a celebrity key would pin one task), or a plain shuffle equi-join
    * (balanced keys — AQE's skew splitting covers the residual). The
    * probes are a single-row count and one map-side-combined key agg —
    * noise against the 100 TB shuffle they can avert, and cacheable
    * across queries when the caller reuses the audit. Routing never
    * changes results: all three paths are the same inner equi-join
    * (equivalence-tested either side of both thresholds). */
  def auto(fact: DataFrame, dim: DataFrame, key: String, saltOn: Column,
           broadcastMaxRows: Long = 1000000L,
           hotKeyShare: Double = 0.2,
           numSalts: Int = 16): DataFrame = {
    val dimRows = dim.agg(count(lit(1))).head().getLong(0)
    if (dimRows <= broadcastMaxRows) fact.join(broadcast(dim), key)
    else {
      val r = fact.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), sum("c").as("n")).head()
      val share =
        if (r.isNullAt(0)) 0.0 // empty fact: nothing to skew
        else r.getLong(0).toDouble / math.max(r.getLong(1), 1L)
      if (share >= hotKeyShare) join(fact, dim, key, numSalts, saltOn)
      else fact.join(dim, key)
    }
  }
}
