package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line on stdout for the driver (→ BENCH_r{N}.json).
  *
  * Hygiene (round-1 verdict items): the timed action is the same full
  * materialization Verify performs (`collect()` of the ordered result, so
  * final sorts are not optimized away as they were under `count()`);
  * failures are reported on stderr and recorded as -1, never silently
  * timed; JVM/codegen/parquet warmup is absorbed by an untimed warmup run
  * of the flagship entry query so the first timed query isn't inflated.
  *
  * Reporting (round-4 verdict item): per-query times are rounded to ms so
  * the line stays compact, and the SAME line is also written to
  * `BENCH.json` in the working directory — the driver's stdout tail
  * capture truncated r4's line mid-JSON, losing q01–q22's timings; the
  * file copy makes every round's numbers recoverable regardless.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (sf0.001, untimed): JVM/codegen + one query per table family
    // (TPC-H star, documents, embeddings, events) so the first timed query
    // of each family doesn't absorb parquet-reader/codegen init
    SparkEntry.entry(spark).collect()
    SparkEntry.queries("q12_token_stats")(spark, "/root/testdata/sf0.001").collect()
    SparkEntry.queries("q21_cosine_topk")(spark, "/root/testdata/sf0.001").collect()
    SparkEntry.queries("q09_events_hourly")(spark, "/root/testdata/sf0.001").collect()

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // settle the JVM between queries: the interpreted-HOF-heavy queries
      // allocate hard, and carryover GC debt otherwise bleeds one query's
      // cost into the next measurement
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).collect(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failed ::= name
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def ms(v: Double): String = // ms precision keeps the line compact
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
