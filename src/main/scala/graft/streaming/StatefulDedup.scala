package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Custom-state streaming dedup via flatMapGroupsWithState — the exact
  * semantic twin of the reference's Redis gate
  * (`/root/reference/src/historydb/redislease.py:56-79`): `tryAdd` only
  * SETEXes when the key is absent, so a key is remembered for a
  * WALL-CLOCK TTL from its FIRST sighting (duplicates do not extend it),
  * which differs from `dropDuplicatesWithinWatermark`'s event-time
  * horizon when event time lags arrival (SURVEY §7.4 calls out the
  * difference; `StreamingOps.dedupStream` is the watermark variant).
  *
  * State per key: the processing-time instant of the first sighting.
  * First sighting emits the record and arms a TTL timeout; duplicates
  * inside the TTL are swallowed (Q8 keep-first, skipped-not-updated) —
  * and MUST re-arm the timeout, because Spark clears a group's timeout
  * on every function invocation (`GroupStateImpl` resets it to
  * NO_TIMESTAMP before each call); re-arming uses the REMAINING duration
  * from first sighting, preserving SETEX-from-first-sighting semantics.
  * When the timeout fires the state is dropped, so the key is admitted
  * again — exactly the reference's expiry behavior.
  */
object StatefulDedup {

  case class Keyed[V](key: String, value: V)

  /** The per-group state transition, factored out so it can be unit-tested
    * deterministically with `TestGroupState` (no wall clock, no streaming
    * query): state holds the first-sighting processing time. */
  def transition[V](rows: Iterator[Keyed[V]], state: GroupState[Long],
                    ttlMs: Long): Iterator[Keyed[V]] =
    if (state.hasTimedOut) {
      state.remove() // TTL expired: forget the key → re-admitted next time
      Iterator.empty
    } else if (state.exists) {
      val firstSeen = state.get
      val now = state.getCurrentProcessingTimeMs()
      val remaining = firstSeen + ttlMs - now
      if (remaining <= 0L) {
        // TTL already ELAPSED but the timer never fired: Spark only
        // delivers timeouts to groups with NO data in a trigger, so a
        // key whose next arrival lands after its TTL reaches this branch
        // instead of hasTimedOut. Redis SETEX would have expired the key
        // by now — treat the arrival as a fresh first sighting (emit,
        // restart the TTL), exactly like TtlDedupProcessor's store-level
        // expiry does. Swallowing it (the pre-fix behavior: clamp the
        // timer to 1ms, emit nothing) silently extended the dedup window
        // past the TTL for keys that keep arriving.
        state.update(now)
        state.setTimeoutDuration(ttlMs)
        rows.take(1)
      } else {
        // Duplicate within TTL: skip (keep-first). Re-arm with the
        // REMAINING duration — the invocation cleared the timeout, and
        // extending by a full ttlMs would silently switch to
        // from-last-sighting semantics and never expire hot keys.
        state.setTimeoutDuration(remaining)
        Iterator.empty
      }
    } else {
      state.update(state.getCurrentProcessingTimeMs())
      state.setTimeoutDuration(ttlMs)
      rows.take(1) // first sighting wins; same-batch dups collapse
    }

  /** Dedup a keyed stream with a processing-time TTL (default 7 days),
    * measured from the key's first sighting. */
  def dedupWithTtl[V](ds: Dataset[Keyed[V]], ttlMs: Long = 7L * 24 * 3600 * 1000)(
      implicit ev: org.apache.spark.sql.Encoder[Keyed[V]]): Dataset[Keyed[V]] = {
    implicit val stateEnc = Encoders.scalaLong
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Long, Keyed[V]](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: String, rows: Iterator[Keyed[V]], state: GroupState[Long]) =>
          transition(rows, state, ttlMs)
      }
  }

  /** Spark-4-native twin via `transformWithState`: a `ValueState` with a
    * `TTLConfig` IS the Redis SETEX — the store expires the entry a TTL
    * after it was WRITTEN, and duplicates never rewrite it, so
    * from-first-sighting semantics need no timer bookkeeping at all (the
    * whole re-arm subtlety `transition` documents disappears). Requires
    * the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  class TtlDedupProcessor[V](ttl: java.time.Duration)
      extends StatefulProcessor[String, Keyed[V], Keyed[V]] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Keyed[V]],
                                 timerValues: TimerValues): Iterator[Keyed[V]] =
      if (seen.exists()) Iterator.empty // duplicate within TTL: keep-first
      else {
        seen.update(true) // the SETEX — TTL runs from this write
        rows.take(1)
      }
  }

  /** `dedupWithTtl` on the `transformWithState` API (state-store-native
    * TTL, RocksDB provider required).
    *
    * Operational note: in processing-time mode the engine schedules
    * ongoing maintenance batches, so `processAllAvailable`/AvailableNow
    * termination is not prompt — production queries run on a continuous
    * trigger anyway; tests should poll progress and stop explicitly. */
  def dedupWithNativeTtl[V](ds: Dataset[Keyed[V]], ttl: java.time.Duration)(
      implicit ev: org.apache.spark.sql.Encoder[Keyed[V]]): Dataset[Keyed[V]] =
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new TtlDedupProcessor[V](ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
}
