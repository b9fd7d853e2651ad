package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("o1", "u1", 100L), ("o2", "u1", 205L), ("o3", "u2", 50L), ("o4", "u3", 10L)
  ).toDF("order_id", "uid", "t")

  private def right = Seq(
    ("u1", 100L, 1L, "a"),   // exact tie with o1's time — must be visible
    ("u1", 200L, 2L, "b"),
    ("u1", 300L, 3L, "c"),   // after both orders — never visible
    ("u2", 40L, 4L, "d"),
    ("u2", 40L, 5L, "e")     // same instant as 4 — tiebreak on max event id
  ).toDF("uid", "ts", "eid", "etype")

  test("backward as-of attaches latest right row at or before left time") {
    val out = AsOfJoin.backward(left, right,
        key = "uid", leftTime = "t", rightTime = "ts",
        rightPayload = Seq("eid", "etype"), rightTieBreak = Some("eid"))
      .orderBy("order_id")
      .select("order_id", "eid", "etype")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // o1: tie at t=100 → eid 1; o2: latest ≤205 is eid 2;
    // o3: two right rows at ts=40, max eid wins → 5; o4: no match → null
    assert(out.toSeq == Seq(("o1", 1L), ("o2", 2L), ("o3", 5L), ("o4", -1L)))
  }

  test("nearest as-of: closer side wins, exact ties prefer past, keyless rows get null direction") {
    val l = Seq(
      ("o1", "u1", 100L), // b at 90 (d=10), f at 105 (d=5) → future
      ("o2", "u1", 95L),  // b at 90 (d=5), f at 105 (d=10) → past
      ("o3", "u1", 110L), // b at 105 (d=5), f at 115 (d=5) → tie → past
      ("o4", "u9", 10L)   // no right rows for u9 → nulls
    ).toDF("order_id", "uid", "t")
    val r = Seq(
      ("u1", 90L, 1L), ("u1", 105L, 2L), ("u1", 115L, 3L)
    ).toDF("uid", "ts", "eid")
    val out = AsOfJoin.nearest(l, r, key = "uid", leftId = "order_id",
        leftTime = "t", rightTime = "ts", rightPayload = Seq("eid"),
        rightTieBreak = Some("eid"))
      .orderBy("order_id")
      .collect()
      .map(row => (row.getAs[String]("order_id"),
        Option(row.getAs[Any]("eid")), Option(row.getAs[String]("direction"))))
    assert(out.toSeq == Seq(
      ("o1", Some(2L), Some("future")),
      ("o2", Some(1L), Some("past")),
      ("o3", Some(2L), Some("past")),
      ("o4", None, None)))
  }

  test("as-of result has one row per left row (no pair blow-up)") {
    val out = AsOfJoin.backward(left, right, "uid", "t", "ts", Seq("eid"))
    assert(out.count() == 4)
  }

  test("plan contains a single exchange, no join node") {
    val out = AsOfJoin.backward(left, right, "uid", "t", "ts", Seq("eid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }

  test("forward as-of attaches earliest right row at or after left time") {
    val out = AsOfJoin.forward(left, right,
        key = "uid", leftTime = "t", rightTime = "ts",
        rightPayload = Seq("eid"), rightTieBreak = Some("eid"))
      .orderBy("order_id").select("order_id", "eid").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // o1 (t=100): tie at ts=100 → eid 1; o2 (t=205): next is ts=300 → 3;
    // o3 (t=50): nothing at/after 50 for u2 → null; o4 (u3): no rows → null
    assert(out.toSeq == Seq(("o1", 1L), ("o2", 3L), ("o3", -1L), ("o4", -1L)))
  }

  test("bucketed variant is equivalent to the plain window form") {
    // one hot key with many rows spanning several buckets, plus a key
    // whose matches must carry across empty buckets
    val rng = new scala.util.Random(7)
    val bigLeft = ((1 to 300).map(i => (s"L$i", "hot", rng.nextInt(1000).toLong)) ++
      Seq(("La", "cold", 950L), ("Lb", "cold", 5L))).toDF("order_id", "uid", "t")
    val bigRight = ((1 to 200).map(i => (s"hot", rng.nextInt(1000).toLong, i.toLong, "x")) ++
      Seq(("cold", 10L, 900L, "y"))).toDF("uid", "ts", "eid", "etype")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("order_id").collect().map(_.toSeq).toSeq

    val plain = AsOfJoin.backward(bigLeft, bigRight, "uid", "t", "ts",
      Seq("eid", "etype"), rightTieBreak = Some("eid"))
    val bucketed = AsOfJoin.backwardBucketed(bigLeft, bigRight, "uid", "t", "ts",
      Seq("eid", "etype"), bucketWidth = 100L, rightTieBreak = Some("eid"))
    assert(canon(bucketed) == canon(plain))

    // NULL key / NULL time left rows: the plain window form retains them
    // (partitionBy groups nulls), so the bucketed form must too — its
    // carry join is null-safe on (key, bucket). Routing never changes
    // results, including for these rows.
    val nullLeft = (Seq(("Ln1", Option.empty[String], Some(950L)),
      ("Ln2", Some("hot"), Option.empty[Long]),
      ("Ln3", Some("cold"), Some(950L))))
      .toDF("order_id", "uid", "t")
    val optRight = bigRight.select(col("uid"), col("ts"), col("eid"), col("etype"))
    val p2 = AsOfJoin.backward(nullLeft, optRight, "uid", "t", "ts",
      Seq("eid", "etype"), rightTieBreak = Some("eid"))
    val b2 = AsOfJoin.backwardBucketed(nullLeft, optRight, "uid", "t", "ts",
      Seq("eid", "etype"), bucketWidth = 100L, rightTieBreak = Some("eid"))
    assert(canon(b2) == canon(p2),
      s"null key/time rows diverge: ${canon(b2)} vs ${canon(p2)}")
    assert(p2.count() == 3, "plain form must retain null key/time left rows")
    // heavy window is (key, bucket)-partitioned in the bucketed plan
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("__b"), s"expected bucket column in plan:\n$plan")
  }

  test("backwardAuto routes on the key profile and matches both variants") {
    // hot regime: 2 distinct keys over 500+ rows → avg rows/key ≫ 3
    val rng = new scala.util.Random(11)
    val hotLeft = ((1 to 300).map(i => (s"L$i", "hot", rng.nextInt(1000).toLong)) ++
      Seq(("La", "cold", 950L))).toDF("order_id", "uid", "t")
    val hotRight = ((1 to 200).map(_ => ("hot", rng.nextInt(1000).toLong,
      rng.nextInt(100000).toLong, "x")) ++
      Seq(("cold", 10L, 900L, "y"))).toDF("uid", "ts", "eid", "etype")
    assert(AsOfJoin.chooseBucketed(hotLeft, hotRight, "uid", maxAvgRowsPerKey = 3.0))
    // dimensioned regime: every row its own key → avg ≈ 2 < 3
    assert(!AsOfJoin.chooseBucketed(left, right, "uid", maxAvgRowsPerKey = 3.0))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("order_id").collect().map(_.toSeq).toSeq
    // auto (bucketed route) ≡ plain on the hot input
    val auto = AsOfJoin.backwardAuto(hotLeft, hotRight, "uid", "t", "ts",
      Seq("eid", "etype"), bucketWidth = 100L, rightTieBreak = Some("eid"),
      maxAvgRowsPerKey = 3.0)
    val plain = AsOfJoin.backward(hotLeft, hotRight, "uid", "t", "ts",
      Seq("eid", "etype"), rightTieBreak = Some("eid"))
    assert(canon(auto) == canon(plain))
    assert(auto.queryExecution.executedPlan.toString.contains("__b"))
    // auto (plain route) ≡ plain on the dimensioned input
    val autoSmall = AsOfJoin.backwardAuto(left, right, "uid", "t", "ts",
      Seq("eid", "etype"), bucketWidth = 100L, rightTieBreak = Some("eid"),
      maxAvgRowsPerKey = 3.0)
    val plainSmall = AsOfJoin.backward(left, right, "uid", "t", "ts",
      Seq("eid", "etype"), rightTieBreak = Some("eid"))
    assert(canon(autoSmall) == canon(plainSmall))
    assert(!autoSmall.queryExecution.executedPlan.toString.contains("__b"))
  }
}
