package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 historization — the warehouse-side
  * merge that keeps dimension HISTORY: an attribute change closes the
  * current version (valid_to = effective date) and opens a new one,
  * instead of overwriting (the reference's upsert sinks are SCD1 /
  * overwrite-by-id, `src/base.py:190-208`; SCD2 is the versioned
  * generalization a warehouse runs for auditable dims).
  *
  * One batch merge = one full-outer equi-join of the OPEN slice against
  * the update batch on the business key (closed history passes through
  * untouched — at 100 TB keep it partition-pruned by `is_current` or
  * valid_to so the join never scans history). Four cases fall out of the
  * join, handled declaratively:
  *   - current only            → survives open, unchanged
  *   - both, attributes equal  → no-op (survives open)
  *   - both, attributes differ → old version closed at eff, new opened
  *   - update only (new key)   → new open version
  * Attribute comparison is a null-safe struct equality (`<=>`), so NULL
  * attribute values neither always-change nor never-change.
  */
object Scd2 {

  /** Merge `updates` into versioned `dim`.
    *
    * @param dim     (keyCol, attrCols..., valid_from, valid_to, is_current)
    * @param updates (keyCol, attrCols..., effCol) — at most one row per key
    * @return the merged dimension, same schema as `dim` */
  def merge(dim: DataFrame, updates: DataFrame, keyCol: String,
            attrCols: Seq[String], effCol: String): DataFrame = {
    // Row-presence detection uses EXPLICIT lit(true) markers (the Cdc
    // snapshotDiff pattern), never isNotNull on a data column: a legit
    // NULL valid_from or NULL effCol would otherwise misclassify the row
    // (an update silently vanishing, or a second is_current version
    // opening without closing the first).
    val open = dim.filter(col("is_current"))
      .withColumn("__in_dim", lit(true))
    val closedHistory = dim.filter(!col("is_current"))
    val uRen = updates.select(
      (col(keyCol) +: attrCols.map(c => col(c).as(s"__u_$c"))) :+
        col(effCol).as("__eff") :+ lit(true).as("__in_upd"): _*)
    val j = open.join(uRen, Seq(keyCol), "full_outer")

    val curExists = col("__in_dim").isNotNull
    val updExists = col("__in_upd").isNotNull
    val changed = !(struct(attrCols.map(col): _*) <=>
      struct(attrCols.map(c => col(s"__u_$c")): _*))

    val dimCols = (keyCol +: attrCols) ++ Seq("valid_from", "valid_to", "is_current")
    // surviving current rows: closed at eff when superseded
    val fromCurrent = j.filter(curExists).select(
      (keyCol +: attrCols).map(col) ++ Seq(
        col("valid_from"),
        when(updExists && changed, col("__eff")).otherwise(col("valid_to")).as("valid_to"),
        (!(updExists && changed)).as("is_current")): _*)
    // new versions: changed attributes or brand-new keys
    val fromUpdates = j.filter(updExists && (!curExists || changed)).select(
      (col(keyCol) +: attrCols.map(c => col(s"__u_$c").as(c))) ++ Seq(
        col("__eff").as("valid_from"),
        lit(null).cast(j.schema("valid_to").dataType).as("valid_to"),
        lit(true).as("is_current")): _*)
    closedHistory.select(dimCols.map(col): _*)
      .unionByName(fromCurrent)
      .unionByName(fromUpdates)
  }
}
