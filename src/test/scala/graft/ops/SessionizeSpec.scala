package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 100L

  test("assign splits on gaps strictly above the threshold") {
    // user 1: gaps 50, 100 (not a break: > only), 101 (break), 10
    val ev = Seq((1L, 0L), (1L, 50L), (1L, 150L), (1L, 251L), (1L, 261L),
        (2L, 5L))
      .toDF("user_id", "us")
    val got = Sessionize.assign(ev, "user_id", "us", Gap)
      .select("user_id", "us", "sess").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 0L), (1L, 50L, 0L), (1L, 150L, 0L),
      (1L, 251L, 1L), (1L, 261L, 1L), (2L, 5L, 0L)))
  }

  test("keyStats rolls sessions up per key") {
    val ev = Seq((1L, 0L), (1L, 50L), (1L, 500L), (2L, 5L))
      .toDF("user_id", "us")
    val got = Sessionize.keyStats(ev, "user_id", "us", Gap)
      .select("user_id", "n_sessions", "n_events", "max_sess_events",
        "total_dur_us", "avg_sess_events")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 2L, 50L, 1.5), (2L, 1L, 1L, 1L, 0L, 1.0)))
  }

  test("sessions agree with Spark's native session_window (batch mode)") {
    // random-ish micros with gaps either side of the threshold; no gap
    // exactly AT it (session_window closes at >=, Sessionize at >)
    val rows = Seq((1L, 0L), (1L, 30L), (1L, 250L), (1L, 260L), (1L, 900L),
      (2L, 10L), (2L, 500L))
    val ev = rows.toDF("user_id", "us")
    val ours = Sessionize.sessions(ev, "user_id", "us", Gap)
      .select("user_id", "n_ev", "dur_us").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    val native = ev
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("us")))
      .groupBy(org.apache.spark.sql.functions.session_window(col("ts"),
        s"${Gap} microseconds"), col("user_id"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_ev"),
        (org.apache.spark.sql.functions.max(col("us"))
          - org.apache.spark.sql.functions.min(col("us"))).as("dur_us"))
      .select("user_id", "n_ev", "dur_us").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(ours == native)
  }

  test("tied timestamps give order-independent session stats") {
    // two rows at us=200 after a >Gap jump: whichever lags first sees the
    // break, the other sees gap 0 — the rollup must not depend on order
    val a = Seq((1L, 0L), (1L, 200L), (1L, 200L)).toDF("user_id", "us")
    val b = Seq((1L, 200L), (1L, 0L), (1L, 200L)).toDF("user_id", "us")
    def stats(df: org.apache.spark.sql.DataFrame) =
      Sessionize.keyStats(df, "user_id", "us", Gap)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(stats(a) == stats(b))
    assert(stats(a) == Set((1L, 2L, 3L, 2L, 0L, 1.5)))
  }

  test("assignSharded equals assign for every shard width — including " +
       "widths below the gap, boundary-straddling sessions, and ties") {
    // deterministic pseudo-random events: 5 keys × ~100 rows, inter-event
    // deltas straddling the gap, duplicate timestamps planted every 7th
    // row, so bucket boundaries of EVERY width cut through sessions
    val rows = for {
      key <- 1L to 5L
      i <- 0 until 100
    } yield {
      val h = (key * 1315423911L + i * 2654435761L) & 0x7FFFFFFFL
      val us = (h % 97) * (i + 1) + (h % 3) * 150L // non-monotone, with ties
      (key, us)
    }
    val ev = rows.toDF("user_id", "us")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "us", "sess").as[(Long, Long, Long)]
        .collect().sorted.toSeq
    val plain = canon(Sessionize.assign(ev, "user_id", "us", Gap))
    for (w <- Seq(1L, 7L, Gap, Gap + 1, 256L, 5000L, Long.MaxValue / 4))
      assert(canon(Sessionize.assignSharded(ev, "user_id", "us", Gap, w))
        == plain, s"shard width $w diverged from the plain window")
  }

  test("Form.Auto routes a hot key to the sharded form with an unchanged " +
       "rollup; cold corpora stay on the plain plan") {
    // hot corpus: one key exceeding AutoHotKeyEvents, plus a cold key —
    // Auto must route (threshold strictly exceeded) and the key-grain
    // rollup must equal the plain form's bit for bit
    val n = Sessionize.AutoHotKeyEvents + 1
    val hot = spark.range(n).selectExpr("1L AS user_id", "id * 60L AS us")
      .unionByName(Seq((2L, 5L), (2L, 500L)).toDF("user_id", "us"))
    def stats(form: Sessionize.Form) =
      Sessionize.keyStats(hot, "user_id", "us", gapUs = 59L, form = form)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(stats(Sessionize.Form.Auto) == stats(Sessionize.Form.Plain))
    // every 60-us step exceeds the 59-us gap: n single-event sessions
    assert(stats(Sessionize.Form.Auto).contains(
      (1L, n, n, 1L, 0L, 1.0)))
  }
}
