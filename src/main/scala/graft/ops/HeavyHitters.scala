package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact top-k frequent items in bounded memory — the two-pass
  * sketch-then-verify plan for when the ITEM DOMAIN itself dwarfs
  * executor memory (web-scale n-grams, URLs, user ids). A plain
  * `groupBy(item).count` holds a domain-sized hash map in every
  * partial-aggregation task and spills; this pass never holds more than
  * `cap` counters anywhere:
  *
  *  1. per-partition Misra-Gries summary of capacity `cap`
  *     (mapPartitions — the documented per-partition-imperative
  *     exception shape; no shuffle, constant memory). Guarantee: any
  *     item with global count > N/(cap+1) survives in at least one
  *     partition (if it fell below the local threshold everywhere,
  *     summing those inequalities would bound its global count too).
  *  2. exact recount of the ≤ cap×partitions candidates only: broadcast
  *     semi-join + groupBy over a candidate-sized key space, then
  *     top-k. Counts are exact; the sketch only PRUNES.
  *
  * The result equals the true top-k whenever the k-th true frequency
  * exceeds N/(cap+1) — size `cap` accordingly (for Zipfian text, tiny
  * caps suffice). Ties rank deterministically (count desc, item asc).
  */
object HeavyHitters {

  /** (item, cnt) of the top `k` most frequent values of `itemCol`. */
  def topItems(df: DataFrame, itemCol: String, k: Int, cap: Int): DataFrame = {
    require(cap > 0 && k > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item")).as[String]
    val candidates = items.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { x =>
        if (m.contains(x)) m(x) += 1L
        else if (m.size < cap) m(x) = 1L
        else for (key <- m.keys.toArray) { // classic MG decrement-all
          val v = m(key) - 1L
          if (v == 0L) m.remove(key) else m(key) = v
        }
      }
      m.keysIterator
    }.distinct().toDF("item")
    items.toDF("item")
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(k)
  }
}
