package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Adaptive Query Execution's three runtime re-plans — the
  * mechanisms this library's 100 TB sizing notes lean on whenever a
  * scaladoc says "AQE handles the runtime skew/size case":
  *
  *  - PARTITION COALESCING: a shuffle configured wide (static
  *    spark.sql.shuffle.partitions) must coalesce its tiny post-shuffle
  *    partitions into few reads — the static setting is a ceiling, not a
  *    task count, so over-provisioning partitions for the worst stage
  *    doesn't tax every small stage with task overhead.
  *
  *  - RUNTIME JOIN DEMOTION (SMJ → broadcast): when the static planner
  *    can't prove a side is small (estimate above threshold) but the
  *    executed shuffle reveals it is, AQE must re-plan the sort-merge
  *    join as a broadcast join mid-query.
  *
  *  - SKEW-JOIN SPLITTING: a hot key whose partition dwarfs the advisory
  *    size must be split into multiple tasks (the AQE complement of the
  *    explicit `ops/SaltedJoin`; SaltedJoin.auto's scaladoc defers the
  *    residual runtime case to exactly this mechanism).
  *
  * All three assert on the FINAL adaptive plan (after materialization),
  * plus result equality where the re-plan could conceivably change
  * semantics.
  */
class AqeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "200",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    ) {
      val df = graft.Tables(spark, dir, "orders")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(df.collect().length == 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("coalesced"),
        s"200 configured partitions over ~5 groups must coalesce, got:\n$plan")
    }
  }

  test("AQE demotes a sort-merge join to broadcast from runtime sizes") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      // static planner may not broadcast; runtime may
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB",
    ) {
      val li = graft.Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = graft.Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      // static plan: sort-merge (broadcast disabled statically)
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      val n = joined.collect().head.getLong(0)
      // final plan: broadcast (runtime size of the filtered side is tiny)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("BroadcastHashJoin"),
        s"runtime-small build side must demote SMJ to broadcast, got:\n$plan")
      val want = li.join(ord.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == want)
    }
  }

  test("AQE splits a skewed partition across tasks") {
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // the demotion rule would broadcast these tiny sides and skip the
      // skew logic entirely — pin the join shape to SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.shuffle.partitions" -> "8",
    ) {
      // one hot key carrying ~100× the rows of the others; the payload is
      // pseudo-random (shuffle partition sizes are COMPRESSED bytes — a
      // constant pad would lz4 away below the skew threshold) and flows
      // into the aggregate so column pruning can't drop it pre-shuffle
      val left = spark.range(0, 60000)
        .select(when(col("id") % 100 =!= 0, lit(1L)).otherwise(col("id") % 50 + 2).as("k"),
          concat(sha2(col("id").cast("string"), 256),
            sha2((col("id") + 1).cast("string"), 256)).as("payload"))
      val right = spark.range(1, 60).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"),
        sum("v").as("sv"), sum(length(col("payload"))).as("bytes"))
      val n = joined.collect().head.getLong(0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"the hot-key partition must be marked and split as skewed, got:\n$plan")
      assert(n == left.filter(col("k").between(1, 59)).count())
    }
  }
}
