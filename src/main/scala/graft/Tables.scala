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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"), name)

  /** The embeddings table restricted to WELL-FORMED vectors (non-null,
    * non-empty embedding). The similarity/clustering operators' input
    * domain is real vectors; at 100 TB a corpus always carries some
    * malformed rows (a failed encoder, a truncated write), and the
    * uniform policy — here and in every oracle's mirrored
    * `WHERE embedding IS NOT NULL AND len(embedding) > 0` — is to DROP
    * them rather than crash (the multimodal corrupt→quarantine
    * precedent). On a null-free corpus the filter is a no-op that
    * parquet prunes at scan time (IsNotNull pushes down). */
  def vectors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, size}
    apply(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
  }

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some driver
    * generations (Spark's vectorized reader rejects it; with
    * spark.sql.legacy.parquet.nanosAsLong=true it surfaces as raw long
    * nanos) and as plain TIMESTAMP(MICROS) in others (surfacing as
    * TIMESTAMP_NTZ — no UTC adjustment flag). Normalize BOTH to the
    * session-UTC TIMESTAMP every query assumes: long nanos truncate to
    * micros (exactly what DuckDB/Arrow do when narrowing ns → us); NTZ
    * casts value-preserving under the UTC session timezone. Shared by
    * [[apply]] AND [[stream]] — the streaming twin must declare the RAW
    * file schema and apply the same transform, or an events stream
    * either fails the schema match or delivers raw-nanos longs. */
  private def normalize(raw: DataFrame, name: String): DataFrame = {
    if (name != "events") return raw
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Streaming twin of `apply` for the file-source queries (q86/q147).
    * The parquet streaming source wants a DIRECTORY to watch, and the two
    * layouts this library meets differ in where that directory is: the
    * driver testdata ships `<dir>/<name>.parquet` as a single FILE (watch
    * `dir`, glob-filtered to the one file), while Spark-written tables
    * (ScaleUp output, any `df.write.parquet`) make it a DIRECTORY of
    * `part-*` files (watch it directly — a glob on the parent would match
    * nothing and the stream would silently deliver zero batches). */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // Declare the RAW file schema (what the parquet actually contains),
    // NOT apply()'s normalized one — declaring normalized types over
    // raw-nanos files fails the reader's type match, and even a lenient
    // read would skip the ns→us transform. The normalization is applied
    // on top of the stream instead, so stream(...) ≡ apply(...) row-wise
    // for every table including events.
    val schema = spark.read.parquet(path).schema
    // Resolve through Hadoop's FileSystem, not java.io.File: on HDFS/S3
    // paths a local-FS check is always false, which would silently take
    // the glob branch and deliver zero batches — the exact failure mode
    // this method exists to prevent.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isDir = fs.exists(hPath) && fs.getFileStatus(hPath).isDirectory
    val raw =
      if (isDir) spark.readStream.schema(schema).parquet(path)
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet").parquet(dir)
    normalize(raw, name)
  }
}
