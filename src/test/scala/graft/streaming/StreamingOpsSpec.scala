package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream keeps first occurrence within the watermark horizon (F8/W4/Q8)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingOps.dedupStream(
      input.toDF().toDF("ts", "key"), "ts", "key")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-03-01 10:00:00"), "a"),
        (ts("2024-03-01 10:05:00"), "a"), // dup within horizon
        (ts("2024-03-01 11:00:00"), "b"))
      q.processAllAvailable()
      input.addData((ts("2024-03-02 09:00:00"), "a")) // still within 7d
      q.processAllAvailable()
      val keys = spark.table("dedup_out").select("key").as[String].collect().toSeq
      assert(keys.sorted == Seq("a", "b"))
    } finally q.stop()
  }

  test("hourlyCounts: tumbling windows with watermark (W1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.hourlyCounts(
      input.toDF().toDF("ts", "etype"), "ts", "etype")
    val q = counts.writeStream.format("memory")
      .queryName("hourly_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-03-01 10:10:00"), "click"),
        (ts("2024-03-01 10:40:00"), "click"),
        (ts("2024-03-01 11:10:00"), "view"))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      input.addData((ts("2024-03-01 14:00:00"), "late"))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("hour", "etype", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts("2024-03-01 10:00:00"), "click", 2L)))
      assert(rows.contains((ts("2024-03-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("slidingCounts: each event lands in width/slide overlapping windows (q73's streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.slidingCounts(
      input.toDF().toDF("ts", "etype"), "ts", "etype",
      width = "2 hours", slide = "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("sliding_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-03-01 10:10:00"), "click"),  // windows 09:00 and 10:00
        (ts("2024-03-01 10:40:00"), "click"),  // windows 09:00 and 10:00
        (ts("2024-03-01 11:10:00"), "click"))  // windows 10:00 and 11:00
      q.processAllAvailable()
      input.addData((ts("2024-03-01 16:00:00"), "late")) // close all windows
      q.processAllAvailable()
      val rows = spark.table("sliding_out")
        .select("w_start", "etype", "n_events")
        .as[(Timestamp, String, Long)].collect()
        .filter(_._2 == "click").map(r => r._1 -> r._3).toMap
      assert(rows == Map(
        ts("2024-03-01 09:00:00") -> 2L,
        ts("2024-03-01 10:00:00") -> 3L,
        ts("2024-03-01 11:00:00") -> 1L))
    } finally q.stop()
  }

  test("sessionCounts: gap merge + session split (q38's streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = StreamingOps.sessionCounts(
      input.toDF().toDF("ts", "user"), "ts", "user", gap = "30 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("session_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-03-01 10:00:00"), "u1"),
        (ts("2024-03-01 10:20:00"), "u1"), // within gap → same session
        (ts("2024-03-01 11:30:00"), "u1")) // > 30 min later → new session
      q.processAllAvailable()
      input.addData((ts("2024-03-01 15:00:00"), "u2")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select("session_start", "user", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts("2024-03-01 10:00:00"), "u1", 2L)))
      assert(rows.contains((ts("2024-03-01 11:30:00"), "u1", 1L)))
    } finally q.stop()
  }

  test("foreachBatch + idempotentAppend: re-delivered micro-batch does not double-append (Q8 exactly-once effect)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val outDir = java.nio.file.Files.createTempDirectory("graft-e1x-out").toString
    val input = MemoryStream[(Long, String)]
    // the batch writer the docs prescribe: partition by batch_id, dynamic
    // overwrite → a retried/redelivered batch replaces its own partition
    def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      graft.sinks.Sinks.idempotentAppend(
        df.withColumn("batch_id", lit(batchId)), outDir, Seq("batch_id"))
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch(writeBatch _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-e1x-ckpt").toString)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      val once = spark.read.parquet(outDir)
      val firstCount = once.count()
      val batchId = once.select("batch_id").distinct().as[Long].collect()(0)
      // simulate at-least-once redelivery: same data, same batch id, again
      writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), batchId)
      assert(spark.read.parquet(outDir).count() == firstCount) // no dupes
    } finally q.stop()
  }

  test("intervalJoinStream: stream-stream join within a bounded lookback") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(Timestamp, String, String)]
    val clicks = MemoryStream[(Timestamp, String, String)]
    val joined = StreamingOps.intervalJoinStream(
      orders.toDF().toDF("o_ts", "o_user", "order_id"),
      clicks.toDF().toDF("c_ts", "c_user", "click_id"),
      key = "o_user", rightKey = "c_user",
      leftTs = "o_ts", rightTs = "c_ts",
      lookback = "1 hour")
    val q = joined.writeStream.format("memory")
      .queryName("interval_out").outputMode("append").start()
    try {
      clicks.addData(
        (ts("2024-03-01 09:30:00"), "u1", "c-in"),      // 30 min before → match
        (ts("2024-03-01 08:30:00"), "u1", "c-old"),     // 90 min before → no
        (ts("2024-03-01 09:45:00"), "u2", "c-otheruser"))
      orders.addData((ts("2024-03-01 10:00:00"), "u1", "o1"))
      q.processAllAvailable()
      // advance both watermarks so results emit
      clicks.addData((ts("2024-03-01 12:00:00"), "zz-c", "c-adv"))
      orders.addData((ts("2024-03-01 12:00:00"), "zz-o", "o-adv"))
      q.processAllAvailable()
      val rows = spark.table("interval_out")
        .select("order_id", "click_id").as[(String, String)].collect().toSet
      assert(rows == Set(("o1", "c-in")))
    } finally q.stop()
  }

  test("runningTopK: complete-mode leaderboard re-ranks as batches arrive") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val top = StreamingOps.runningTopK(input.toDF().toDF("tag"), "tag", k = 2)
    val q = top.writeStream.format("memory")
      .queryName("topk_out").outputMode("complete").start()
    try {
      input.addData("a", "a", "b", "c")
      q.processAllAvailable()
      val r1 = spark.table("topk_out").as[(String, Long)].collect().toSeq
      assert(r1 == Seq(("a", 2L), ("b", 1L))) // tie b/c → lexicographic
      // c overtakes everything; leaderboard must re-rank, not append
      input.addData("c", "c", "c")
      q.processAllAvailable()
      val r2 = spark.table("topk_out").as[(String, Long)].collect().toSeq
      assert(r2 == Seq(("c", 4L), ("a", 2L)))
    } finally q.stop()
  }

  test("enrichStream: stream-static broadcast join enriches without shuffling the stream (J1)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("AAPL", 4510L), ("TSLA", 4010L)).toDF("ticker", "icb_code")
    val input = MemoryStream[(Timestamp, String)]
    val enriched = StreamingOps.enrichStream(
      input.toDF().toDF("ts", "ticker"), dim, "ticker")
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-03-01 10:00:00"), "AAPL"),
        (ts("2024-03-01 10:01:00"), "ZZZZ")) // not in universe → null code
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select("ticker", "icb_code")
        .as[(String, Option[Long])].collect().toMap
      assert(rows == Map("AAPL" -> Some(4510L), "ZZZZ" -> None))
    } finally q.stop()
  }
}
