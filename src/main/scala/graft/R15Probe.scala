package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization-round scratch probes: stage-attributed timings for
  * the queries under the knife this round. One subcommand per
  * investigation; numbers land in OPTIMIZATION_r15.md.
  *
  * Usage: runMain graft.R15Probe <probe> [sfDir] [reps]
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: () => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"R15PROBE $label%-14s min=${ts.min}%6.2f s  times=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    SparkEntry.entry(spark).collect() // warmup
    probe match {
      case "q58" =>
        import graft.text.TextOps
        val d = Tables(spark, dir, "documents")
        println(s"R15PROBE docs=${d.count()}")
        time("full")(() =>
          SparkEntry.queries("q58_sketch_stats")(spark, dir).collect())
        time("vocab")(() => noop(
          d.select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
            .groupBy("source")
            .agg(approx_count_distinct(col("token"), rsd = 0.01).as("approx_vocab"),
              countDistinct(col("token")).as("exact_vocab"))))
        time("vocab_hll")(() => noop(
          d.select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
            .groupBy("source")
            .agg(approx_count_distinct(col("token"), rsd = 0.01).as("approx_vocab"))))
        time("vocab_exact")(() => noop(
          d.select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
            .groupBy("source")
            .agg(countDistinct(col("token")).as("exact_vocab"))))
        time("tokens_only")(() => noop(
          d.select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))))
        time("lengths")(() => noop(
          d.groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              percentile_approx(col("n_chars"), array(lit(0.5), lit(0.95)), lit(10000)).as("ps"),
              expr("percentile(n_chars, 0.5)").as("ex50"),
              expr("percentile(n_chars, 0.95)").as("ex95"),
              expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)").as("d50"),
              expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").as("d95"))))
      case "q120" =>
        val li = Tables(spark, dir, "lineitem")
        println(s"R15PROBE li=${li.count()}")
        time("full")(() =>
          SparkEntry.queries("q120_lateral_top_order")(spark, dir).collect())
        time("agg_dec")(() => noop(
          li.groupBy(col("l_suppkey"), col("l_orderkey"))
            .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(28,12)")).cast("double"), 4).as("revenue"))))
        time("agg_dbl")(() => noop(
          li.groupBy(col("l_suppkey"), col("l_orderkey"))
            .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))))
        time("agg_top1")(() => noop {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy("l_suppkey")
            .orderBy(col("revenue").desc, col("l_orderkey"))
          li.groupBy(col("l_suppkey"), col("l_orderkey"))
            .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(28,12)")).cast("double"), 4).as("revenue"))
            .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        })
      case "q149" =>
        import graft.similarity.{Cosine, KMeans}
        val corpus = Tables.vectors(spark, dir)
          .select(col("vec_id"), Cosine.toDouble(col("embedding")).as("vec"))
        val seed = KMeans.collectSeed(
          corpus.filter(col("vec_id") < 26), "vec_id", "vec")
        var cens: Seq[(Long, Array[Double])] = null
        time("train_rdd")(() => {
          cens = KMeans.train(corpus, "vec_id", "vec", seed, rounds = 3)
        })
        time("train_rel")(() => {
          KMeans.trainRelationalForSpec(corpus, "vec_id", "vec", seed, rounds = 3)
        })
        time("assign")(() => noop(
          KMeans.assignCells(corpus, "vec_id", "vec", cens)))
        time("full_cold")(() => {
          val fs = org.apache.hadoop.fs.FileSystem.getLocal(
            spark.sparkContext.hadoopConfiguration)
          new java.io.File("spark-warehouse").listFiles().toSeq
            .filter(_.getName.startsWith("graft_kmeans_cens_"))
            .foreach { f =>
              spark.sql(s"DROP TABLE IF EXISTS `${f.getName}`")
              org.apache.commons.io.FileUtils.deleteDirectory(f)
            }
          SparkEntry.queries("q149_kmeans_train")(spark, dir).collect(): Unit
        })
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
