package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** The Mongo→ES migration lifecycle (SURVEY.md §3.3,
  * `/root/reference/src/base.py:155-196` + `src/utils/database_utils.py:66-113`)
  * with the reference's acked-ids TODO fixed, in a shape that scales:
  *
  *   staging.filter(just_insert) → per-partition batched bulk write →
  *   acked ids emitted as a DATASET (mapPartitions transform, never a
  *   driver-side collect) → flag reset joins acked ids back.
  *
  * Failed batches emit no acks, so their documents keep `just_insert`
  * and are retried on the next run — unlike the reference, which reset
  * the flag for everything including failures (`database_utils.py:65`).
  * The writer must be idempotent under task retries (the reference's ES
  * `_op_type='create'` is: replays conflict and are dropped).
  */
object Migrate {

  /** Run one migration pass. Returns the updated staging table (caller
    * persists it transactionally). `write` throwing fails that batch
    * only. */
  def migrate(staging: DataFrame, idCol: String, batchSize: Int)
             (write: Seq[Row] => Unit): DataFrame = {
    val staged = staging.filter(col("just_insert"))
    val idIdx = staged.schema.fieldIndex(idCol)
    val acked = staged
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // Materialize the ack ids INSIDE the try: a lazy iterator over
          // batch would evaluate getLong after the catch exits, so a bad
          // id row (null, wrong type) would escape the per-batch failure
          // policy and abort the task instead of just failing the batch.
          try { val ids = batch.map(_.getLong(idIdx)); write(batch); ids.iterator }
          catch { case _: Exception => Iterator.empty }
        }
      }(Encoders.scalaLong)
      .toDF(idCol)
    Sinks.resetJustInsert(staging, acked, idCol)
  }
}
