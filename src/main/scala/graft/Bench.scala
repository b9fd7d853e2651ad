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
  * Reporting (round-4 verdict item, sharpened round 7): the FULL 147-query
  * line is written to `BENCH.json` in the working directory and printed
  * once for human logs — but at ~3.5 kB it exceeds the driver's 2000-char
  * stdout tail capture, which head-truncated it into `parsed: null` for
  * three straight rounds (BENCH_r04–r06). So the LAST stdout line is now a
  * compact (<1 kB) JSON the tail always contains whole: the 11-query
  * relational baseline set individually (the BASELINE.md bench gate),
  * plus whole-surface totals and a pointer to the full per-query file.
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
    val fullLine = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(fullLine) // human logs; too long for the driver's 2000-char tail
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
      (fullLine + "\n").getBytes("UTF-8"))

    // Compact driver-facing line, printed LAST so the stdout tail capture
    // always contains it whole: the BASELINE.md bench-gate set (the 11
    // round-1 relational queries) individually + whole-surface summary.
    val baseline11 = results.filter { case (k, _) =>
      k.matches("q(0[1-9]|1[01])_.*") }
    val bSum = baseline11.collect { case (_, v) if v >= 0 => v }.sum
    val bqs = baseline11.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"baseline11_total","value":${ms(bSum)},"unit":"sec","queries":$bqs,""" +
      s""""surface":{"n":${results.size},"total_sec":${ms(total)},"errors":$errs},""" +
      s""""sf":"$sfDir","full_per_query":"BENCH.json"}"""
    println(compact)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
