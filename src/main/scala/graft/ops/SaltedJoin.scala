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
}
