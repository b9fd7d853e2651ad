package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.broadcast

/** Lifecycle helpers for eagerly-materialized plans.
  *
  * Spark frees a `localCheckpoint(true)`'s storage only when the driver
  * GCs the RDD reference AND the ContextCleaner runs — unbounded latency
  * in a long-lived session (the q164 / MinHashLSH-Auto lesson: repeated
  * calls accumulated GB-scale executor storage between driver GCs).
  * When the code KNOWS a checkpointed plan will never be read again,
  * release it explicitly instead.
  */
object Checkpoints {

  /** Explicitly free an eager localCheckpoint's blocks. The RDD lives
    * behind the checkpointed Dataset's `LogicalRDD` leaf; non-blocking
    * unpersist is safe because the caller guarantees nothing reads the
    * plan afterwards. No-op on non-checkpointed plans. */
  def release(checkpointed: Dataset[_]): Unit =
    checkpointed.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Default row cap for [[guardedBroadcast]]: ~40 MB of longs — the
    * same driver-safety bar q164's survivor-hash broadcast uses. */
  val DefaultBroadcastMaxRows: Long = 5000000L

  /** Broadcast a "small" side only after PROVING it is small. A forced
    * `broadcast()` hint bypasses `autoBroadcastJoinThreshold` entirely,
    * so a set assumed pair-bounded (e.g. dedup drop lists) OOMs the
    * driver the day a dup-heavy corpus makes it corpus-fraction-sized.
    * The input is eagerly localCheckpointed (so the sizing count and the
    * consuming join share one materialization — and the count never
    * re-runs an expensive lineage), then wrapped in the broadcast hint
    * only under `maxRows`; past it the join falls back to shuffle —
    * graceful degradation instead of a fatal collect. The checkpoint is
    * ContextCleaner-released once the returned plan is executed and
    * dropped (the caller DOES read it, unlike [[release]] sites). */
  def guardedBroadcast(df: DataFrame,
                       maxRows: Long = DefaultBroadcastMaxRows): DataFrame = {
    val mat = df.localCheckpoint(true)
    if (mat.count() <= maxRows) broadcast(mat) else mat
  }
}
