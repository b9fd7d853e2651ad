package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    ("a", ts("2024-01-01 10:00:00"), 1.0),
    ("a", ts("2024-01-01 11:00:00"), 2.0),
    ("a", ts("2024-01-03 09:00:00"), 5.0),
    ("b", ts("2024-01-02 09:00:00"), 2.5)
  ).toDF("k", "ts", "value")

  test("gaps densify to zero counts with LOCF values, per key's own span") {
    val got = GapFill.forwardFillDaily(events, "k", "ts", "value")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", 2L, 3.0),
      ("a", "2024-01-02", 0L, 3.0), // gap day: zero events, carried value
      ("a", "2024-01-03", 1L, 5.0),
      ("b", "2024-01-02", 1L, 2.5)  // b's span is its own single day
    ), got.mkString(","))
  }

  test("hour grain and unsupported grain") {
    val hourly = GapFill.forwardFillDaily(events, "k", "ts", "value", grain = "hour")
      .filter($"k" === "a").collect()
    // a spans 10:00 Jan 1 .. 09:00 Jan 3 hourly = 48 buckets
    assert(hourly.length == 48)
    intercept[IllegalArgumentException] {
      GapFill.forwardFillDaily(events, "k", "ts", "value", grain = "month")
    }
  }
}
