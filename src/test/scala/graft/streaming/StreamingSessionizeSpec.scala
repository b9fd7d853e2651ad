package graft.streaming

import graft.SparkSpec
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import StreamingSessionize._

/** Deterministic state-machine tests for the streaming sessionizer —
  * no wall clock, no streaming query (the q158 certification runs the
  * real multi-batch stream against the q128 batch oracle; these pin the
  * transition semantics a green hash can't localize). */
class StreamingSessionizeSpec extends SparkSpec {

  private val gap = 100L // micros, for readable fixtures

  private def ev(us: Long) = SessEvent(1L, new java.sql.Timestamp(us / 1000L), us)

  private def st(state: Option[SessBuf], wmMs: Long, timedOut: Boolean = false) =
    TestGroupState.create[SessBuf](
      Optional.fromNullable(state.orNull),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      Optional.of(Long.box(wmMs)).asInstanceOf[Optional[Long]], timedOut)

  test("split: gap strictly greater than threshold starts a new session") {
    assert(split(Seq.empty, gap) == Seq.empty)
    assert(split(Seq(5L), gap) == Seq(Seq(5L)))
    // 100-gap joins (≤), 101-gap splits (>)
    assert(split(Seq(0L, 100L, 201L, 290L), gap) ==
      Seq(Seq(0L, 100L), Seq(201L, 290L)))
    // chained: each step ≤ gap keeps one session even if span ≫ gap
    assert(split(Seq(0L, 90L, 180L, 270L), gap) == Seq(Seq(0L, 90L, 180L, 270L)))
    // tied timestamps stay in one session (gap 0)
    assert(split(Seq(0L, 0L, 0L, 200L), gap) == Seq(Seq(0L, 0L, 0L), Seq(200L)))
  }

  test("split agrees with the batch Sessionize splitter on a random multiset") {
    val rnd = new scala.util.Random(42)
    val ts = Seq.fill(500)(rnd.nextInt(20000).toLong).sorted
    val runs = split(ts, gap)
    assert(runs.flatten == ts) // partition, order-preserving
    runs.foreach { r =>
      r.sliding(2).foreach { case Seq(a, b) => assert(b - a <= gap); case _ => }
    }
    runs.sliding(2).foreach {
      case Seq(a, b) => assert(b.head - a.last > gap)
      case _ =>
    }
  }

  test("transition: watermark 0 buffers everything, arms the earliest close") {
    val s = st(None, wmMs = 0L)
    val out = transition(1L, Iterator(ev(5000L), ev(1000L)), s, gap).toList
    assert(out.isEmpty)
    assert(s.get == SessBuf(Seq(1000L, 5000L))) // sorted on merge
    // earliest open session is (1000), close = 1100 µs → 1 ms + 1
    assert(s.getTimeoutTimestampMs.get() == (1000L + gap) / 1000L + 1L)
  }

  test("transition: closed prefix emits, open tail is retained, timer re-arms") {
    val s = st(Some(SessBuf(Seq(1000L, 1050L, 5000L))), wmMs = 2L) // wm = 2000 µs
    val out = transition(1L, Iterator(ev(5080L)), s, gap).toList
    // session (1000,1050) closed at 1150 ≤ 2000; (5000,5080) still open
    assert(out == List(Session(1L, 1000L, 1050L, 2L)))
    assert(s.get == SessBuf(Seq(5000L, 5080L)))
    assert(s.getTimeoutTimestampMs.get() == (5080L + gap) / 1000L + 1L)
  }

  test("transition: timeout with everything closed drains and removes state") {
    val s = st(Some(SessBuf(Seq(1000L, 1050L, 5000L))), wmMs = 10L, timedOut = true)
    val out = transition(1L, Iterator.empty, s, gap).toList
    assert(out == List(Session(1L, 1000L, 1050L, 2L), Session(1L, 5000L, 5000L, 1L)))
    assert(s.isRemoved)
  }

  test("transition: same-batch events spanning several sessions emit all closed ones") {
    val s = st(None, wmMs = 1L) // wm = 1000 µs
    val out = transition(1L,
      Iterator(ev(0L), ev(50L), ev(300L), ev(800L), ev(950L)), s, gap).toList
    // sessions: (0,50) close 150; (300) close 400; (800) close 900 — all
    // ≤ wm 1000 — and (950) close 1050 > 1000 stays open
    assert(out == List(Session(1L, 0L, 50L, 2L), Session(1L, 300L, 300L, 1L),
      Session(1L, 800L, 800L, 1L)))
    assert(s.get == SessBuf(Seq(950L)))
  }

  test("transition: duplicate timestamps count as distinct events in the multiset") {
    val s = st(Some(SessBuf(Seq(1000L))), wmMs = 5L, timedOut = true)
    val s2 = st(None, wmMs = 0L)
    transition(1L, Iterator(ev(1000L), ev(1000L)), s2, gap)
    assert(s2.get == SessBuf(Seq(1000L, 1000L)))
    val out = transition(1L, Iterator.empty, s, gap).toList
    assert(out == List(Session(1L, 1000L, 1000L, 1L)))
  }
}
