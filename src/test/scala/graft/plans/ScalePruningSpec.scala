package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the two Catalyst runtime-pruning features that decide how much
  * of a 100 TB fact table a dimension-filtered join actually reads:
  *
  *  - DYNAMIC PARTITION PRUNING: a join on a partition column against a
  *    filtered dim must inject a `dynamicpruning` subquery into the fact
  *    scan's PartitionFilters — the fact side then lists only the
  *    partitions the dim survivors name, instead of scanning all of them
  *    and filtering post-join. On a date/source-partitioned corpus this
  *    is the difference between reading 2% and 100% of the table.
  *
  *  - RUNTIME BLOOM FILTER (row-level runtime filter): for a shuffle
  *    join whose creation side is selectively filtered, Catalyst builds
  *    a bloom filter over the join keys and applies
  *    `bloom_filter_might_contain` on the application side BEFORE the
  *    exchange — shrinking the shuffled bytes by the filter's
  *    selectivity. The row-level complement of DPP for non-partition
  *    join keys.
  *
  * These are plan-shape contracts, not correctness oracles (results are
  * also asserted against the unpruned computation): a conf default
  * flipping in a Spark upgrade, or a query edit that breaks the
  * injection preconditions, fails here rather than silently costing a
  * full-table scan at scale.
  */
class ScalePruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: filtered dim join prunes fact partitions") {
    val tmp = Files.createTempDirectory("dpp_fact").toString
    val ord = graft.Tables(spark, dir, "orders")
    ord.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // tiny dim keeping 2 of 5 priorities; selective filter on a non-join
    // column (a DPP precondition: the dim must be filtered, not just small)
    import spark.implicits._
    // the dim must be a SCANNED relation with a surviving Filter node: an
    // in-memory Seq constant-folds to a LocalTableScan (filter and all),
    // leaving DPP no selective predicate to key on
    val dimPath = Files.createTempDirectory("dpp_dim").toString
    Seq(("1-URGENT", 0), ("2-HIGH", 1), ("3-MEDIUM", 2),
        ("4-NOT SPECIFIED", 3), ("5-LOW", 4)).toDF("prio", "rank")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("rank") < 2)
    val joined = fact.join(broadcast(dim), col("o_orderpriority") === col("prio"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning PartitionFilter, got:\n$plan")

    // pruning must not change results: equals the direct filtered agg
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ord.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("runtime bloom filter: selective creation side injects a row-level filter") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local files are tiny; drop the size floors so injection triggers
      // the same way it would on a 100 TB application side
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    ) {
      val li = graft.Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = graft.Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000.0) // selective creation side
        .select("o_orderkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"lineitem side must pre-filter through the runtime bloom filter, got:\n$plan")
      // tree printing is parent-first, so a child Filter appears AFTER its
      // Exchange line: the probe textually following the exchange means it
      // sits below it in the plan — pre-shuffle, where it shrinks bytes
      assert(plan.indexOf("might_contain") > plan.indexOf("Exchange hashpartitioning(l_orderkey"),
        "the bloom probe must sit BELOW lineitem's shuffle exchange (it exists to shrink shuffled bytes)")
      // the filter is a prune, never a semantics change
      val n = joined.collect().head.getLong(0)
      val want = li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == want)
    }
  }
}
