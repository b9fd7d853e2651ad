package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev sandbox: time the q24 hierarchical-vote forms at an arbitrary SF
  * dir (the sf0.1 measurements in SectorVote's scaladoc; this re-runs
  * them at rehearsal scale). Usage: runMain graft.ScratchForms <sfDir> */
object ScratchForms {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.enrich.SectorVote
    def icb8 = (pmod(col("p_size"), lit(5)) + 1) * 1000000L +
      pmod(col("p_partkey"), lit(5)) * 10000L +
      pmod(col("p_partkey"), lit(3)) * 100L +
      pmod(col("p_partkey"), lit(2))
    def pairs = Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("doc"), icb8.cast("long").as("code"))
    // noop write, NOT count(): count lets Catalyst prune every column,
    // deleting the winner computation itself — a count-based comparison
    // times only the groupBy skeletons (the first version of this
    // harness made exactly that mistake)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"FORM $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    pairs.count() // warm file listing/footers
    time("windowed") { SectorVote.hierarchical(pairs, "doc", "code") }
    time("hashAggCascade") { SectorVote.hierarchicalHashAgg(pairs, "doc", "code") }
    time("compactHof") { SectorVote.hierarchicalCompact(pairs, "doc", "code") }
    time("hybridTypedAgg") {
      import spark.implicits._
      val reduced = pairs.groupBy("doc", "code").agg(count(lit(1)).as("cnt"))
        .as[(Long, Long, Long)]
      reduced.groupByKey(_._1).mapValues(r => (r._2, r._3))
        .agg(SectorVote.hierarchicalAggWeighted().toColumn.name("v"))
        .select(col("key").as("doc"), col("v.sector"), col("v.level"))
    }
    spark.stop()
  }
}
