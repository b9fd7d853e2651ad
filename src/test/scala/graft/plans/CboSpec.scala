package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins cost-based optimization: with table + column statistics in the
  * catalog and `spark.sql.cbo.enabled`, Catalyst must (a) carry the
  * ANALYZE-computed stats into the optimized plan instead of raw file
  * sizes, and (b) broadcast the SMALLEST side of a multi-join from those
  * stats rather than join in the literal FROM order. At 100 TB the FROM
  * order is whatever the query author typed; statistics are what keep a
  * fact-dim-dim chain from shuffling the fact table twice.
  *
  * (The AQE suite covers RUNTIME re-planning from executed-shuffle
  * sizes; this covers the STATIC planner's stats path — the one that
  * matters for the first shuffle, which AQE can't retroactively avoid.)
  */
class CboSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** DROP TABLE only clears this JVM's in-memory catalog; the managed
    * table's warehouse DIRECTORY survives from a previous test JVM and
    * fails the next saveAsTable with LOCATION_ALREADY_EXISTS — remove
    * both. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    if (loc.exists) rm(loc)
  }

  /** Each test (re)creates every table it reads so `testOnly -z` on a
    * single test works — no cross-test table dependency. */
  private def analyzedTable(name: String, source: String): Unit = {
    resetTable(name)
    graft.Tables(spark, dir, source)
      .write.mode("overwrite").saveAsTable(name)
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  test("ANALYZE stats flow into the optimized plan and pick the broadcast side") {
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.statistics.histogram.enabled" -> "true",
      // force the decision through catalog stats, not file-size fallback:
      // only ANALYZEd row counts distinguish the filtered dim's true size
      "spark.sql.autoBroadcastJoinThreshold" -> "1MB",
    ) {
      analyzedTable("cbo_lineitem", "lineitem")
      analyzedTable("cbo_supplier", "supplier")

      // stats present and carried: rowCount visible on the analyzed table
      val stats = spark.table("cbo_supplier").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong > 0L),
        "ANALYZE must populate a catalog rowCount the optimizer can see")

      // supplier (100 rows) must be the broadcast build side against the
      // 6k-row lineitem, regardless of FROM order putting it first
      val joined = spark.sql("""
        SELECT s_nationkey, count(*) AS n
        FROM cbo_supplier JOIN cbo_lineitem ON s_suppkey = l_suppkey
        GROUP BY s_nationkey""")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats must qualify the small dim for broadcast, got:\n$plan")
      val build = plan.indexOf("BroadcastExchange")
      assert(build >= 0 && plan.indexOf("cbo_supplier", build) >= 0,
        "the BROADCAST side must be the stats-small supplier table")
      assert(joined.collect().map(_.getLong(1)).sum ==
        spark.table("cbo_lineitem").count())
    }
  }

  test("join reorder: adversarial FROM order never plans a cartesian") {
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
    ) {
      // FROM lists (nation, lineitem, supplier): ADJACENT pairs share no
      // join key — taken literally, nation ⋈ lineitem is a cross product
      // multiplied by 6k rows before supplier ties the keys together. The
      // reorderer must chain the equi-keys (lineitem–supplier–nation)
      // regardless of the authored order.
      analyzedTable("cbo_lineitem", "lineitem")
      analyzedTable("cbo_supplier", "supplier")
      analyzedTable("cbo_nation", "nation")

      val q = spark.sql("""
        SELECT n_name, count(*) AS n
        FROM cbo_nation, cbo_lineitem, cbo_supplier
        WHERE s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        GROUP BY n_name""")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"reorder must chain equi-joins, not evaluate the FROM order's cross pair, got:\n$plan")
      assert(q.collect().map(_.getLong(1)).sum ==
        spark.table("cbo_lineitem").count())
    }
  }
}
