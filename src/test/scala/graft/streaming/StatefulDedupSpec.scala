package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.StatefulDedup.Keyed

class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState dedup: keep-first within TTL, state survives restart (F8/Q6/Q8)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val outDir = Files.createTempDirectory("graft-dedup-out").toString
    val input = MemoryStream[Keyed[String]]
    val out = StatefulDedup.dedupWithTtl(input.toDS())

    // ProcessingTimeTimeout makes the engine run continuous timeout-check
    // batches, starving processAllAvailable — drive each batch with
    // AvailableNow against a shared checkpoint instead (which also proves
    // the dedup state survives a query restart). The memory sink cannot
    // recover from a checkpoint, so write parquet and read it back.
    def runOnce(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", outDir).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.stop()
    }

    input.addData(Keyed("a", "first-a"), Keyed("a", "dup-a-same-batch"), Keyed("b", "first-b"))
    runOnce()
    input.addData(Keyed("a", "dup-a-next-batch"), Keyed("c", "first-c"))
    runOnce()
    val vals = spark.read.parquet(outDir).as[Keyed[String]]
      .collect().map(k => k.key -> k.value).toMap
    assert(vals == Map("a" -> "first-a", "b" -> "first-b", "c" -> "first-c"))
  }

  test("transformWithState dedup: native state TTL keeps-first, expires, re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
      val outDir = Files.createTempDirectory("graft-tws-out").toString
      val input = MemoryStream[Keyed[String]]
      // 12s: long enough that two poll-driven runs land inside the TTL on
      // a normal machine, short enough that the mandatory expiry sleep
      // stays modest (the old 30s TTL slept ~30s every run)
      val ttlSecs = 12L
      val out = StatefulDedup.dedupWithNativeTtl(
        input.toDS(), java.time.Duration.ofSeconds(ttlSecs))
      // In processing-time mode the engine keeps scheduling maintenance
      // batches, so neither processAllAvailable nor an AvailableNow run
      // terminates promptly — start a query per step, poll its progress
      // until the data batch is processed, then stop. Restarting from one
      // checkpoint also proves TWS state survives a query restart.
      def runOnce(): Unit = {
        val q = out.writeStream.format("parquet")
          .option("path", outDir).outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        val deadline = System.currentTimeMillis() + 120000
        while (!q.recentProgress.exists(_.numInputRows > 0) &&
               q.exception.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(q.exception.isEmpty, s"query failed: ${q.exception}")
        q.stop()
      }
      val t0 = System.currentTimeMillis()
      input.addData(Keyed("a", "first-a"), Keyed("a", "dup-same-batch"),
        Keyed("b", "first-b"))
      runOnce()
      input.addData(Keyed("a", "dup-across-restart"))
      runOnce()
      // the dup batch must have run inside the TTL for the test to mean
      // anything — a timing PRECONDITION, not an assertion: on a loaded
      // machine slow runs cancel the test instead of failing the suite
      assume(System.currentTimeMillis() - t0 < ttlSecs * 1000,
        "runs too slow to assert within-TTL suppression")
      val beforeExpiry = spark.read.parquet(outDir).as[Keyed[String]]
        .collect().map(_.value).toSet
      assert(beforeExpiry == Set("first-a", "first-b"))
      // let the state TTL lapse, then the key is admitted again
      val sinceFirst = System.currentTimeMillis() - t0
      Thread.sleep(math.max(0, ttlSecs * 1000 + 2000 - sinceFirst))
      input.addData(Keyed("a", "second-life"))
      runOnce()
      val vals = spark.read.parquet(outDir).as[Keyed[String]]
        .collect().map(_.value).toSet
      assert(vals == Set("first-a", "first-b", "second-life"))
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  // Deterministic transition tests via TestGroupState — no wall clock, no
  // streaming query; this is what guards the round-2 advice regression
  // (timeout lost on the duplicate branch → key deduped forever).

  import org.apache.spark.api.java.Optional
  import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

  private val ttl = 1000L

  private def st(state: Option[Long], nowMs: Long, timedOut: Boolean = false) =
    TestGroupState.create[Long](
      Optional.fromNullable(state.map(Long.box).orNull).asInstanceOf[Optional[Long]],
      GroupStateTimeout.ProcessingTimeTimeout(), nowMs,
      Optional.empty[Long](), timedOut)

  test("transition: first sighting emits once, records firstSeen, arms TTL") {
    val s = st(None, nowMs = 100L)
    val out = StatefulDedup.transition(
      Iterator(Keyed("k", "v1"), Keyed("k", "v2")), s, ttl).toList
    assert(out.map(_.value) == List("v1")) // same-batch dups collapse
    assert(s.get == 100L)
    assert(s.getTimeoutTimestampMs.get() == 100L + ttl)
  }

  test("transition: duplicate within TTL is swallowed AND re-arms the timeout " +
       "with the REMAINING duration from first sighting (round-2 advice)") {
    // Spark clears a group's timeout on every invocation; without the
    // re-arm, this key would be deduped forever and its state never freed.
    val s = st(Some(100L), nowMs = 400L)
    val out = StatefulDedup.transition(Iterator(Keyed("k", "dup")), s, ttl).toList
    assert(out.isEmpty)
    assert(s.get == 100L) // firstSeen unchanged (SETEX only when absent)
    // deadline stays firstSeen + ttl — NOT now + ttl (from-first-sighting)
    assert(s.getTimeoutTimestampMs.get() == 100L + ttl)
  }

  test("transition: arrival AFTER the TTL elapsed (timer not yet fired) is a fresh " +
       "first sighting — emitted, state reset (Redis SETEX expiry without the timeout)") {
    // Spark only fires ProcessingTimeTimeout for groups with NO data in
    // a trigger, so a key whose next arrival lands past its TTL reaches
    // the state.exists branch, not hasTimedOut. SETEX semantics: the key
    // expired at firstSeen + ttl, so this arrival must be re-admitted
    // and restart the TTL — the pre-fix code swallowed it and clamped
    // the timer to 1ms, silently extending the dedup window for keys
    // that keep arriving.
    val now = 100L + ttl + 500L
    val s = st(Some(100L), nowMs = now)
    val out = StatefulDedup.transition(Iterator(Keyed("k", "second-life")), s, ttl).toList
    assert(out.map(_.value) == List("second-life"))
    assert(s.get == now) // fresh first sighting recorded
    assert(s.getTimeoutTimestampMs.get() == now + ttl) // full TTL re-armed
  }

  test("transition: arrival exactly AT the deadline counts as expired (re-admitted)") {
    // remaining == 0 is the boundary: SETEX expires the key AT the
    // deadline, and a 0ms re-arm would be rejected by Spark anyway.
    val now = 100L + ttl
    val s = st(Some(100L), nowMs = now)
    val out = StatefulDedup.transition(Iterator(Keyed("k", "at-deadline")), s, ttl).toList
    assert(out.map(_.value) == List("at-deadline"))
    assert(s.get == now && s.getTimeoutTimestampMs.get() == now + ttl)
  }

  test("transition: timeout removes state so the key is re-admitted (Redis SETEX expiry)") {
    val s = st(Some(100L), nowMs = 100L + ttl + 1, timedOut = true)
    val out = StatefulDedup.transition(Iterator.empty[Keyed[String]], s, ttl).toList
    assert(out.isEmpty)
    assert(s.isRemoved)
    // next sighting is a fresh first sighting
    val s2 = st(None, nowMs = 5000L)
    val out2 = StatefulDedup.transition(Iterator(Keyed("k", "second-life")), s2, ttl).toList
    assert(out2.map(_.value) == List("second-life"))
  }
}
