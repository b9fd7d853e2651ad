package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing value-RANGE window aggregation, sharded for scale — the
  * boundary-overlap decomposition of `Window.partitionBy(lowCard)
  * .orderBy(key).rangeBetween(-frame, 0)`.
  *
  * The naive frame partitions by a LOW-cardinality key (an event type, a
  * source), so one key's ordered scan is one task's work no matter how
  * large the table grows — the sf1 rehearsal measured it as the worst
  * scaler on the surface (4.1× for 10× rows: parallelism is capped at
  * |types|, so extra data serializes). This is the standard fix:
  *
  *  1. assign each row to a shard of the order key — floor(key / shard)
  *     with shard width strictly greater than the frame length, so a
  *     row's trailing frame can only reach into the immediately
  *     preceding shard;
  *  2. emit each row twice: once OWNED by its shard, once as CONTEXT
  *     into the next shard (within one shard an original row appears at
  *     most once, so frame aggregates over owned+context rows are exact);
  *  3. run the ordinary RANGE window inside each (partition, shard) —
  *     bounded by shard width, parallelism grows with the key span —
  *     and keep only the owned rows.
  *
  * Cost: one extra copy of the input through the shuffle (2× rows) in
  * exchange for parallelism proportional to data span instead of key
  * cardinality. Aggregates must not double-count rows ACROSS shards —
  * trailing COUNT/SUM/MIN/MAX over the frame qualify because every
  * frame is fully contained in owned ∪ context of one shard.
  *
  * Shard assignment is exact floor division: `(k − pmod(k, s)) div s`.
  * The numerator is an exact multiple of `s` (pmod is the nonnegative
  * remainder), so long `div`'s truncation is harmless even for negative
  * keys — and unlike Spark's `/` (which is DOUBLE division on longs,
  * exact only below 2^53), integer `div` is exact for ALL long keys,
  * including nanosecond timestamps and large synthetic ids.
  */
object ShardedRangeFrame {

  /** Append trailing-RANGE aggregates of the `-frame..0` window over
    * `orderCol` (a LONG column, e.g. unix_micros) per `partCols` group.
    * `aggs` maps output name → window-aggregate expression (count/sum/
    * min/max over columns of `df`). `shard` must exceed `frame`. */
  def trailingAgg(df: DataFrame, partCols: Seq[String], orderCol: String,
                  frame: Long, shard: Long,
                  aggs: Seq[(String, Column)]): DataFrame = {
    require(shard > frame,
      s"shard width ($shard) must exceed the frame length ($frame) so a " +
        "frame spans at most two shards")
    val k = col(orderCol)
    val shardId =
      expr(s"(`$orderCol` - pmod(`$orderCol`, ${shard}L)) div ${shard}L")
    val owned = df.withColumn("__shard", shardId).withColumn("__own", lit(true))
    val context = df.withColumn("__shard", shardId + 1).withColumn("__own", lit(false))
    val w = Window.partitionBy((partCols :+ "__shard").map(col): _*)
      .orderBy(k).rangeBetween(-frame, 0)
    aggs.foldLeft(owned.unionByName(context)) { case (d, (name, expr)) =>
        d.withColumn(name, expr.over(w))
      }
      .filter(col("__own"))
      .drop("__shard", "__own")
  }
}
