package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Option[Int])*) =
    rows.toDF("id", "name", "score")

  test("I/U/D classification; no-ops filtered out") {
    val old = snap((1L, "a", Some(1)), (2L, "b", Some(2)), (3L, "c", Some(3)))
    val neu = snap((2L, "b", Some(2)), (3L, "c", Some(9)), (4L, "d", Some(4)))
    val out = Cdc.snapshotDiff(old, neu, "id", Seq("name", "score"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "D"), (3L, "U"), (4L, "I")))
    val u = out(1)
    assert(u.getAs[Int]("old_score") === 3 && u.getAs[Int]("new_score") === 9)
    val i = out(2)
    assert(i.isNullAt(i.fieldIndex("old_name")) &&
      i.getAs[String]("new_name") === "d")
  }

  test("null attributes compare null-safely") {
    val old = snap((1L, "a", None), (2L, "b", None))
    val neu = snap((1L, "a", None), (2L, "b", Some(5)))
    val out = Cdc.snapshotDiff(old, neu, "id", Seq("name", "score"))
      .orderBy("id").collect()
    // id 1: NULL <=> NULL is a no-op, not an update
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(out.head.getString(1) === "U")
  }

  test("identical snapshots produce an empty changelog") {
    val old = snap((1L, "a", Some(1)))
    assert(Cdc.snapshotDiff(old, old, "id", Seq("name", "score")).isEmpty)
  }

  test("key-only tables (empty attrCols) diff membership: I/D only, never U") {
    // The reference's update_universe is exactly this — a pure id-set
    // diff. Pre-fix this crashed on attrCols.map(...).reduce before any
    // Spark job ran.
    val old = Seq(1L, 2L, 3L).toDF("id")
    val neu = Seq(2L, 3L, 4L).toDF("id")
    val out = Cdc.snapshotDiff(old, neu, "id", Nil).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "D"), (4L, "I")))
  }
}
