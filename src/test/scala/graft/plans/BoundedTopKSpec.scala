package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom physical operator must agree exactly with the declarative
  * spellings (window row_number, salted `ops/TopK`) and plan as the
  * partial → exchange → final pair the scaladoc promises. */
class BoundedTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def keyset(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("matches the window row_number spelling on real data") {
    val ord = graft.Tables(spark, dir, "orders")
    val got = BoundedTopK.perGroup(ord, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
    val want = graft.ops.TopK.perGroup(ord, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3, saltOn = hash(col("o_orderkey")))
    assert(keyset(got) == keyset(want))
    assert(got.count() == 15) // 5 priorities × 3
  }

  test("plans as partial -> single exchange -> final") {
    val ord = graft.Tables(spark, dir, "orders")
    val df = BoundedTopK.perGroup(ord, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BoundedTopKPartial") && plan.contains("BoundedTopKFinal"),
      s"expected the two-phase pair, got:\n$plan")
    val pPartial = plan.indexOf("BoundedTopKPartial")
    val pFinal = plan.indexOf("BoundedTopKFinal")
    val pExchange = plan.indexOf("Exchange hashpartitioning(o_orderpriority")
    assert(pFinal < pExchange && pExchange < pPartial,
      s"the group exchange must sit BETWEEN final and partial, got:\n$plan")
  }

  test("k larger than every group passes groups through whole") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val got = BoundedTopK.perGroup(df, Seq("g"), Seq(col("v").asc), k = 10)
    assert(got.count() == 3)
  }

  test("exact boundary: ties beyond k are cut by the tiebreaker, not kept") {
    import spark.implicits._
    // four rows tie on v; the id tiebreaker must keep exactly k, and
    // exactly the k smallest ids — the deterministic-total-order contract
    val df = Seq(("a", 5, 1L), ("a", 5, 2L), ("a", 5, 3L), ("a", 5, 4L),
      ("a", 4, 9L)).toDF("g", "v", "id")
    val got = BoundedTopK.perGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("multi-column grouping and null group keys") {
    import spark.implicits._
    val df = Seq((Some("x"), "p", 1L), (Some("x"), "p", 2L), (None, "p", 3L),
      (None, "p", 4L), (None, "q", 5L)).toDF("g1", "g2", "id")
    val got = BoundedTopK.perGroup(df, Seq("g1", "g2"), Seq(col("id").asc), k = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    // one winner per (g1,g2) group incl. the null-keyed one
    assert(got == Set(1L, 3L, 5L))
  }

  test("property: equals the naive per-group sorted take on random data") {
    import spark.implicits._
    import org.scalacheck.Gen
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2", "g3", "g4"),
      Gen.choose(0, 50), Gen.choose(1, 8))
    val dataGen = Gen.zip(Gen.listOfN(120, rowGen), Gen.choose(1, 6))
    val params = Gen.Parameters.default
    (0 until 6).foreach { i =>
      dataGen.apply(params, org.scalacheck.rng.Seed(2000L + i)).foreach {
        case (rows, k) =>
          val data = rows.zipWithIndex.map { case ((g, v, _), id) => (g, v, id.toLong) }
          val df = data.toDF("g", "v", "id").repartition(5)
          val got = BoundedTopK.perGroup(df, Seq("g"),
              Seq(col("v").desc, col("id").asc), k)
            .select("id").collect().map(_.getLong(0)).toSet
          val want = data.groupBy(_._1).values.flatMap(
            _.sortBy(r => (-r._2, r._3)).take(k)).map(_._3).toSet
          assert(got == want, s"case $i (k=$k)")
      }
    }
  }

  test("guards: empty groupCols is a clear API error, not a planner crash") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      BoundedTopK.perGroup(df, Seq.empty, Seq(col("v").asc), k = 1)
    }
    assert(e.getMessage.contains("groupCols"))
  }

  test("auto router: few groups take the bounded heap, 10^6 groups fall back to the spilling window") {
    // few-groups regime → custom operator
    val few = spark.range(0, 10000)
      .select((org.apache.spark.sql.functions.col("id") % 5).as("g"),
        org.apache.spark.sql.functions.col("id"))
    val fewDf = BoundedTopK.perGroupAuto(few, Seq("g"), Seq(col("id").asc), k = 2)
    assert(fewDf.queryExecution.executedPlan.toString.contains("BoundedTopKFinal"))
    assert(fewDf.count() == 10)

    // 10^6 distinct groups × k=3 over the 1M-row default budget → the
    // resident-heap shape would hold ~3M rows per worst-case task; the
    // router must choose the UnsafeExternalSorter-backed window instead
    val many = spark.range(0, 1000000)
      .select(col("id").as("g"), (col("id") * 7 % 13).as("v"))
    val manyDf = BoundedTopK.perGroupAuto(many, Seq("g"), Seq(col("v").asc), k = 3,
      maxResidentRows = 1L << 20)
    val plan = manyDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BoundedTopKFinal") && plan.contains("Window"),
      s"high-cardinality groups must route to the window path, got:\n$plan")
    assert(manyDf.count() == 1000000) // k=3 >= 1 row per group: all pass
  }

  test("partial caps shuffled rows at groups x k per input partition") {
    import spark.implicits._
    // 4 input partitions x 1 group x k=2: the exchange may carry at most
    // 8 rows; verify via the partial operator's own semantics — the
    // final sees <= partitions*k rows, and results stay exact
    val df = spark.range(0, 10000, 1, 4)
      .select(lit("g").as("g"), col("id"))
    val got = BoundedTopK.perGroup(df, Seq("g"), Seq(col("id").asc), k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L))
  }
}
