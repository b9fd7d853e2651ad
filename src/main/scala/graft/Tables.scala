package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read the parquet files
  * directly; filters/projections declared on top of these scans are pushed
  * into the parquet reader by Catalyst (verify via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as raw long nanos and truncate to micros
      // (exactly what DuckDB/Arrow do when narrowing ns → us). Requires
      // spark.sql.legacy.parquet.nanosAsLong=true, set at session build
      // time by every entry point (Verify/Bench/Scratch/test harness) —
      // not here, to keep table loading side-effect free.
      require(
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "set spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession builder")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
