package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the
  * same key and right.time <= left.time (backward as-of — the classic
  * "state of the world when the event happened" lookup; e.g. the last
  * user interaction before an order was placed).
  *
  * Spark has no built-in as-of join. The naive form —
  * `left.join(right, key && rTime <= lTime)` then a max-window — first
  * MATERIALIZES every (left × matching-right) pair: for a key with n
  * lefts and m rights that is n×m rows before the window prunes them, a
  * scale-killer. This implementation uses the union trick instead:
  *
  *  1. union right rows (tagged 0) and left rows (tagged 1) into one
  *     relation with a common (key, time) pair;
  *  2. one window over (key) ordered by (time, tag), carrying
  *     last_value(right payload, ignoreNulls) — each row sees the most
  *     recent right row at-or-before it (right sorts before left on time
  *     ties, so an exact-tie right row IS visible to the left row);
  *  3. keep only left rows.
  *
  * Cost: ONE shuffle of |left| + |right| rows and a per-key sort — the
  * same exchange a sort-merge join would do, with no pair blow-up.
  *
  * Skew note: the window partitions by key, so a single hot key sorts on
  * one task. If keys are few/hot, pre-split by time range (partition the
  * window by (key, coarse time bucket) and carry the last value of the
  * previous bucket in a second, bucket-level pass) — same pattern as
  * TopK's salting; not needed for dimensioned keys like user ids.
  */
object AsOfJoin {

  /** Backward as-of join. `rightPayload` columns from the right side are
    * returned nullable (null = no right row at or before the left time).
    * Left columns pass through unchanged. Time ties within the right side
    * are broken by `rightTieBreak` (latest wins), keeping the result
    * deterministic when a key has several right rows at one instant. */
  def backward(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               rightTieBreak: Option[String] = None): DataFrame = {
    // Deterministic within-instant winner on the right side: one row per
    // (key, time) — max_by on the tiebreaker (a tiny pre-aggregation that
    // also shrinks the union input).
    val rightDedup = rightTieBreak match {
      case Some(tb) =>
        val payloadStruct = struct(rightPayload.map(col): _*)
        right.groupBy(col(key), col(rightTime))
          .agg(max_by(payloadStruct, col(tb)).as("__p"))
      case None =>
        right.select(col(key), col(rightTime),
          struct(rightPayload.map(col): _*).as("__p"))
    }

    val leftCols = left.columns.toSeq
    val rTagged = rightDedup.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
        col("__p")) ++ leftCols.map(c => lit(null).as(s"__l_$c")): _*)
    val lTagged = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
        lit(null).as("__p")) ++ leftCols.map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(p => col("__last").getField(p).as(p)): _*)
  }
}
