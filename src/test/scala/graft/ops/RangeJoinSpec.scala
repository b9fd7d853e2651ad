package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval matches containment semantics (end exclusive)") {
    val pts = Seq((1L, 5.0), (2L, 10.0), (3L, 19.9), (4L, 20.0), (5L, 35.0))
      .toDF("pid", "pt")
    val ivs = Seq(("w1", 0.0, 20.0), ("w2", 10.0, 30.0)).toDF("w", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "pt", "s", "e", bucketWidthSec = 10L)
      .select("pid", "w").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "w1"), (2L, "w1"), (2L, "w2"), (3L, "w1"),
      (3L, "w2"), (4L, "w2")))
  }

  test("inverted/empty intervals match nothing and never explode") {
    // end <= start is unsatisfiable containment, but Spark's two-arg
    // sequence() steps -1 when start > stop: pre-fix, one corrupt
    // interval with an epoch-seconds start and end = 0 exploded into
    // ~start/bucketWidth DESCENDING bucket rows before the residual
    // filter discarded them. The interval side now filters end > start
    // BEFORE the explode, so this completes instantly and empty.
    val pts = Seq((1L, 5.0), (2L, 1.7e9)).toDF("pid", "pt")
    val ivs = Seq(
      ("corrupt", 1.7e9, 0.0),  // inverted: would be ~472k bucket rows
      ("empty", 10.0, 10.0)     // zero-length: end exclusive → no bucket
    ).toDF("w", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "pt", "s", "e", bucketWidthSec = 3600L)
    assert(out.count() == 0)
  }

  test("interval spanning many buckets still matches once per point") {
    val pts = Seq((1L, 55.0)).toDF("pid", "pt")
    val ivs = Seq(("big", 0.0, 100.0)).toDF("w", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "pt", "s", "e", 10L)
    assert(out.count() == 1)
  }

  test("plan is an equi-join on the bucket, not a nested-loop/cartesian") {
    val pts = Seq((1L, 5.0)).toDF("pid", "pt")
    val ivs = Seq(("w1", 0.0, 20.0)).toDF("w", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, ivs, "pt", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"expected bucketed equi-join:\n$plan")
  }
}
