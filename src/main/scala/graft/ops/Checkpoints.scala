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
    * plan afterwards. No-op on non-checkpointed plans.
    *
    * Contract: the argument must BE the checkpoint — the Dataset
    * `localCheckpoint` returned, possibly under trivial unary wrappers
    * (a projection/filter/alias over it). Releasing used to walk the
    * whole analyzed plan and unpersist EVERY LogicalRDD leaf, which
    * would also free a shared live checkpoint merely referenced by a
    * derived plan (a join of the dead checkpoint with a live one) —
    * failing later actions on the live plan with missing-block reads.
    * Now only the unary-chain ROOT is released: a plan with more than
    * one input is a derived plan, not a checkpoint, and is a no-op. */
  def release(checkpointed: Dataset[_]): Unit = {
    @scala.annotation.tailrec
    def rootRdd(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        Option[org.apache.spark.sql.execution.LogicalRDD] = p match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr)
      case u if u.children.length == 1 => rootRdd(u.children.head)
      case _ => None
    }
    rootRdd(checkpointed.queryExecution.analyzed)
      .foreach(_.rdd.unpersist(blocking = false))
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
    * graceful degradation instead of a fatal collect.
    *
    * Lifecycle (residual, accepted): the checkpoint blocks are freed by
    * ContextCleaner only after the driver GCs the returned plan — the
    * delayed-release class [[release]] eliminates elsewhere. An eager
    * release hook is structurally unavailable here: the returned frame
    * is composed lazily into the CALLER's result plan, whose execution
    * point (a `collect` in Verify/Bench, a sink write) lies outside
    * this function and usually outside the library, so there is no
    * post-action site that could call [[release]]. The accumulation is
    * bounded per call — ≤ `maxRows` ids when broadcast; the degraded
    * path keeps the full set but only materializes what the shuffle
    * join would have anyway — and repeated invocations in one session
    * (q48/q63/q64/q157) retire their blocks at the next driver GC. */
  def guardedBroadcast(df: DataFrame,
                       maxRows: Long = DefaultBroadcastMaxRows): DataFrame = {
    val mat = df.localCheckpoint(true)
    if (mat.count() <= maxRows) broadcast(mat) else mat
  }
}
