package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture by snapshot diff — derive the insert/update/delete
  * changelog between two full snapshots of a keyed table. The complement
  * of [[Scd2]]: SCD2 *applies* a known change batch to keep history; CDC
  * diff *discovers* the change batch when all you get is periodic full
  * dumps. The reference does exactly this for its stock universe —
  * `update_universe` (`src/workqueue_setup.py:14-44`) re-pulls the full
  * Postgres universe and probes Mongo row by row (`find_one` per key),
  * inserting only absent ids: an O(n) round-trip loop that detects
  * inserts but never updates or deletes. One declarative full-outer
  * join replaces the loop and completes the I/U/D triple.
  *
  * One full-outer equi-join on the business key; the four join cases map
  * to ops declaratively:
  *   - new only              → I (insert)
  *   - old only              → D (delete)
  *   - both, attrs differ    → U (update, old+new values side by side)
  *   - both, attrs equal     → no-op, filtered OUT before the changelog
  * Attribute comparison is null-safe struct equality (`<=>`), so NULL
  * attributes neither always-diff nor never-diff.
  *
  * 100 TB: one shuffle of each snapshot on the key (bucketing both dumps
  * by key makes it exchange-free); the no-op majority is dropped by a
  * post-join filter so the output is change-sized, never snapshot-sized.
  * Never collect-and-compare — the diff IS the join.
  */
object Cdc {

  /** Diff `newSnap` against `oldSnap` on `keyCol`.
    *
    * @return (keyCol, op, old_<attr>..., new_<attr>...) — one row per
    *         changed key; op ∈ {I, U, D}; absent side's attrs are NULL */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                   attrCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(col(keyCol) +:
      attrCols.map(c => col(c).as(s"__o_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newSnap.select(col(keyCol) +:
      attrCols.map(c => col(c).as(s"__n_$c")) :+
      lit(true).as("__in_new"): _*)
    // Key-only tables (attrCols empty) are a legitimate pure-membership
    // diff — the reference's update_universe loop is exactly this — so
    // "attributes equal" degenerates to true (I/D only, never U) rather
    // than crashing on an empty reduce.
    val same = attrCols
      .map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .foldLeft(lit(true))(_ && _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .when(!same, lit("U")))
      .filter(col("op").isNotNull)
      .select(col(keyCol) +: col("op") +:
        (attrCols.map(c => col(s"__o_$c").as(s"old_$c")) ++
         attrCols.map(c => col(s"__n_$c").as(s"new_$c"))): _*)
  }
}
