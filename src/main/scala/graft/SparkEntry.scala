package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY.md §2 to a DataFrame
  * program over the driver-provided parquet tables; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.defs, RelationalQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (DedupQueries.defs, DedupQueries.oracles),
      (SimilarityQueries.defs, SimilarityQueries.oracles),
      (EnrichQueries.defs, EnrichQueries.oracles),
      (PipelineQueries.defs, PipelineQueries.oracles),
      (NlpQueries.defs, NlpQueries.oracles),
      (TemporalQueries.defs, TemporalQueries.oracles),
      (SearchQueries.defs, SearchQueries.oracles),
      (CurationQueries.defs, CurationQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q03RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
