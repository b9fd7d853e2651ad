package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{Cosine, Pca}

/** Stage-attributed profile of q94 (power-iteration PCA projection) — the
  * largest steady non-harness bench cost at sf0.1 this round (~11 s).
  * Times each phase separately so the wall is attributable:
  *
  *   means     dimMeans explode + decimal agg + collect (one pass)
  *   center    centered() zip_with + localCheckpoint(true) (one pass)
  *   round1    one power-iteration round over the checkpointed corpus
  *   rounds8   the full 8-round loop
  *   project   projection + round + orderBy + collect
  *
  * Usage: runMain graft.Q94Profile [sfDir] [reps]
  */
object Q94Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dims = graft.queries.SimilarityQueries.Dims
    def time(label: String)(f: () => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q94PROF $label%-10s min=${ts.min}%6.2f s  times=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // --explain: print the OLD per-round DataFrame plan (the shape the
    // r15 treeAggregate rewrite replaced) + the final query plan, for
    // plans/r15/ evidence, then exit.
    if (args.contains("--explain")) {
      val all0 = Tables.vectors(spark, dir)
      val xc0 = Pca.centered(all0, "vec_id", "embedding").localCheckpoint(true)
      val v00 = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
      val vLit0 = array(v00.map(lit): _*)
      println("===== q94 OLD per-round plan (dot -> posexplode -> decimal agg), x8 rounds =====")
      xc0.select(Cosine.dot(col("xv"), vLit0).as("s"), col("xv"))
        .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double").as("u"))
        .explain("formatted")
      println("===== q94 final (project) plan =====")
      SparkEntry.queries("q94_pca_project")(spark, dir).explain("formatted")
      spark.stop(); return
    }

    SparkEntry.entry(spark).collect() // warmup
    val all = Tables.vectors(spark, dir)
    println(s"Q94PROF rows=${all.count()} dims=$dims parts=${all.rdd.getNumPartitions}")

    time("means")(() => { Pca.dimMeans(all, "vec_id", "embedding"); () })
    var xc: org.apache.spark.sql.DataFrame = null
    time("center")(() => {
      xc = Pca.centered(all, "vec_id", "embedding").localCheckpoint(true)
    })
    println(s"Q94PROF xc parts=${xc.rdd.getNumPartitions}")
    val v0 = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    time("round1")(() => {
      val vLit = array(v0.map(lit): _*)
      xc.select(Cosine.dot(col("xv"), vLit).as("s"), col("xv"))
        .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double").as("u"))
        .collect()
      ()
    })
    // same-Dataset re-collect: execution only (no analysis/codegen)
    locally {
      val vLit = array(v0.map(lit): _*)
      val df = xc.select(Cosine.dot(col("xv"), vLit).as("s"), col("xv"))
        .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double").as("u"))
      df.collect()
      time("reexec")(() => { df.collect(); () })
    }
    // v shipped as DATA (1-row broadcast cross join) so the generated
    // code is identical across rounds -> codegen cache hit
    locally {
      import spark.implicits._
      def mk(v: Array[Double]) = {
        val vdf = broadcast(Seq(Tuple1(v)).toDF("vv"))
        xc.crossJoin(vdf)
          .select(Cosine.dot(col("xv"), col("vv")).as("s"), col("xv"))
          .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
          .groupBy("d")
          .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double").as("u"))
      }
      mk(v0).collect()
      time("vdata")(() => { mk(v0.map(_ * 1.0000001)).collect(); () })
    }
    // RDD treeAggregate round: no catalyst, no shuffle
    locally {
      val rdd = xc.rdd.map(r => r.getSeq[Double](1).toArray)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      rdd.count()
      def rddRound(v: Array[Double]): Array[java.math.BigDecimal] = {
        val zero = Array.fill(dims)(java.math.BigDecimal.ZERO)
        rdd.treeAggregate(zero)(
          (acc, xv) => {
            var s = 0.0
            var d = 0
            while (d < dims) { s += xv(d) * v(d); d += 1 }
            d = 0
            while (d < dims) {
              acc(d) = acc(d).add(new java.math.BigDecimal(java.lang.Double.toString(xv(d) * s)).setScale(12, java.math.RoundingMode.HALF_UP))
              d += 1
            }
            acc
          },
          (a, b) => { var d = 0; while (d < dims) { a(d) = a(d).add(b(d)); d += 1 }; a })
      }
      rddRound(v0)
      time("rddround")(() => { rddRound(v0); () })
    }
    var v: Array[Double] = null
    time("rounds8")(() => { v = Pca.principalComponent(xc, dims, 8) })
    time("project")(() => {
      Pca.project(xc, "vec_id", v)
        .select(col("vec_id"), round(col("proj"), 4).as("proj"))
        .orderBy("vec_id").collect()
      ()
    })
    spark.stop()
  }
}
