package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming dedup via flatMapGroupsWithState — the exact
  * semantic twin of the reference's Redis gate
  * (`/root/reference/src/historydb/redislease.py:56-79`): a key is
  * remembered for a WALL-CLOCK TTL from its last sighting (Redis SETEX),
  * which differs from `dropDuplicatesWithinWatermark`'s event-time
  * horizon when event time lags arrival (SURVEY §7.4 calls out the
  * difference; `StreamingOps.dedupStream` is the watermark variant).
  *
  * State per key: nothing but existence + a processing-time timeout.
  * First sighting emits the record and arms a TTL timeout; duplicates
  * inside the TTL are swallowed (Q8 keep-first, skipped-not-updated);
  * when the timeout fires the state is dropped, so the key is admitted
  * again — exactly the reference's expiry behavior.
  */
object StatefulDedup {

  case class Keyed[V](key: String, value: V)

  /** Dedup a keyed stream with a processing-time TTL (default 7 days). */
  def dedupWithTtl[V](ds: Dataset[Keyed[V]], ttlMs: Long = 7L * 24 * 3600 * 1000)(
      implicit ev: org.apache.spark.sql.Encoder[Keyed[V]]): Dataset[Keyed[V]] = {
    implicit val stateEnc = Encoders.scalaLong
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Long, Keyed[V]](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: String, rows: Iterator[Keyed[V]], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // TTL expired: forget the key
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // duplicate within TTL: skip (keep-first)
          } else {
            state.update(1L)
            state.setTimeoutDuration(ttlMs)
            rows.take(1) // first sighting wins; same-batch dups collapse
          }
      }
  }
}
