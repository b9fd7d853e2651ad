package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attributed profile of q24 (hierarchical sector rollup) — the
  * largest steady non-harness ×100 cost center after q35's two-tier fix
  * (59.7–86.7 s, the widest session spread in the gate; round-12
  * verdict #4). Times three nested plan prefixes to a noop sink,
  * min-of-N each, so the deltas attribute the wall:
  *
  *   reduced   scan + broadcast part join + (doc, code) count agg
  *   cascade   + the typed hierarchicalAggWeighted groupByKey
  *   full      + the final orderBy(l_orderkey) presentation sort
  *
  * Usage: runMain graft.Q24Profile [sfDir] [reps]
  */
object Q24Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", (cpus.toInt * 6).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def icb8(partkey: org.apache.spark.sql.Column, size: org.apache.spark.sql.Column) =
      (pmod(size, lit(5)) + 1) * 1000000L + pmod(partkey, lit(5)) * 10000L +
        pmod(partkey, lit(3)) * 100L + pmod(partkey, lit(2))

    def reduced() = {
      val li = Tables(spark, dir, "lineitem")
      val part = Tables(spark, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey").cast("long").as("doc"),
          icb8(col("p_partkey"), col("p_size")).cast("long").as("code"))
        .agg(count(lit(1)).as("cnt"))
    }
    def cascade() = reduced().as[(Long, Long, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(graft.enrich.SectorVote.hierarchicalAggWeighted().toColumn.name("v"))
      .select(col("key").as("l_orderkey"),
        col("v.sector").as("sector"), col("v.level").as("level"))
    def full() = cascade().orderBy("l_orderkey")

    def time(label: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q24PROF $label%-10s min=${ts.min}%7.1f s  times=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    // hypothesis variant: the global sort's range exchange SAMPLES its
    // child for partition bounds, executing the whole cascade twice; an
    // eager checkpoint between cascade and sort should cut the re-run
    def fullCkpt() = cascade().localCheckpoint(true).orderBy("l_orderkey")

    SparkEntry.entry(spark).collect() // warmup
    time("reduced")(() => reduced().toDF())
    time("cascade")(() => cascade().toDF())
    time("full")(() => full().toDF())
    time("fullCkpt")(() => fullCkpt().toDF())
    spark.stop()
  }
}
