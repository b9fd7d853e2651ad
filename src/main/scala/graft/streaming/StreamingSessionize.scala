package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as CUSTOM event-time state — the streaming
  * twin of `ops/Sessionize` (q38/q128), built on `flatMapGroupsWithState`
  * with an EVENT-TIME timeout (the one arbitrary-state shape
  * `StatefulDedup` leaves unexercised: its TTL gate is processing-time).
  * `StreamingOps.sessionCounts` delegates session bookkeeping to Spark's
  * `session_window`; this operator owns the state machine instead, which
  * is what a pipeline needs the moment a session carries custom payload
  * (distinct-type sets, first/last event ids, per-session quality
  * features) that `session_window` aggregation cannot express.
  *
  * Reference analog: the per-source hour-window batching of
  * `/root/reference/src/utils/reddit_api.py:38-54` generalized to
  * data-driven boundaries, run online.
  *
  * State machine per key (state = sorted event-time buffer of OPEN
  * sessions only):
  *  - on input: merge the batch's timestamps into the buffer, split the
  *    buffer into gap-sessions, EMIT every session already closed by the
  *    current watermark (close = last event + gap ≤ watermark — no
  *    in-order future event can extend it, and later-than-watermark
  *    events cannot land before it), and retain only the open tail;
  *  - the event-time timer is re-armed at the MINIMUM close among
  *    retained sessions (strictly above the watermark by the retention
  *    rule), so the store wakes the key exactly when its oldest open
  *    session becomes closable;
  *  - on timeout: same transition with no new rows — closed sessions
  *    drain, state is dropped when nothing stays open.
  *
  * 100 TB: state per key is the OPEN sessions' timestamps only — closed
  * sessions shed eagerly every invocation, so state is bounded by the
  * gap horizon × per-key event rate, not by stream history. The
  * transition is a pure function (unit-tested deterministically with
  * `TestGroupState`, no clock); q158 certifies a genuine multi-batch
  * streamed run equals the q128 batch oracle EXACTLY.
  */
object StreamingSessionize {

  /** One keyed event; `us` carries exact event-time micros (the
    * Timestamp column exists for Spark's watermark machinery — `ts` and
    * `us` must denote the same instant). */
  case class SessEvent(key: Long, ts: java.sql.Timestamp, us: Long)

  /** Open-session buffer: ascending event-time micros. */
  case class SessBuf(ts: Seq[Long])

  /** A completed session. `dur_us = end_us - start_us`. */
  case class Session(key: Long, start_us: Long, end_us: Long, n_ev: Long)

  /** Split an ascending timestamp multiset into gap-sessions: a new
    * session starts where the inter-event gap exceeds `gapUs`. */
  def split(sorted: Seq[Long], gapUs: Long): Seq[Seq[Long]] =
    sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
      if (acc.nonEmpty && t - acc.last.last <= gapUs)
        acc.init :+ (acc.last :+ t)
      else acc :+ Vector(t)
    }

  /** The per-group transition, factored out for deterministic unit
    * tests (`TestGroupState`): merge, split, emit watermark-closed
    * sessions, retain the open tail, re-arm the timer at the earliest
    * retained close. */
  def transition(key: Long, rows: Iterator[SessEvent],
                 state: GroupState[SessBuf], gapUs: Long): Iterator[Session] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val prev = if (state.exists) state.get.ts else Seq.empty[Long]
    val merged = (prev ++ rows.map(_.us)).sorted
    val runs = split(merged, gapUs)
    // Sessions are time-ordered and close = last + gap is strictly
    // increasing across runs (runs are separated by > gap), so the
    // closed set is a prefix.
    val (closed, open) = runs.partition(r => r.last + gapUs <= wmUs)
    if (open.isEmpty) { if (state.exists) state.remove() }
    else {
      state.update(SessBuf(open.flatten))
      // Earliest retained close, floored to ms, +1: strictly above the
      // watermark for ANY gap (close > wmUs = wmMs·1000 ⇒ ⌊close/1000⌋ ≥
      // wmMs ⇒ +1 is strict, as setTimeoutTimestamp requires), and the
      // timer fires only once the watermark has truly passed the close.
      state.setTimeoutTimestamp((open.head.last + gapUs) / 1000L + 1L)
    }
    closed.iterator.map(r => Session(key, r.head, r.last, r.length.toLong))
  }

  /** Sessionize a keyed event stream: emits one row per COMPLETED
    * session (a session completes when the watermark passes its close).
    * `ds` must carry exact micros in `us` alongside the watermark
    * column `ts`; sessions still open at end-of-stream stay in state —
    * deliver a later event (or advance the watermark past their close)
    * to drain them, exactly like any watermark-governed operator. */
  def sessions(ds: Dataset[SessEvent], gapUs: Long,
               lateness: String = "10 minutes"): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val bufEnc = Encoders.product[SessBuf]
    ds.withWatermark("ts", lateness)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessBuf, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, rows: Iterator[SessEvent], state: GroupState[SessBuf]) =>
          transition(k, rows, state, gapUs)
      }
  }
}
