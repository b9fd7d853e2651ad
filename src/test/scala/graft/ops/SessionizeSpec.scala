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
}
