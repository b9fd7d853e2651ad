package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}
import graft.text.TextOps

/** Source-shape re-expressions (SURVEY.md §2.1). The reference's lurkers
  * interleave HTTP fetching with parsing; our engine abstracts the fetch —
  * in tests and fixtures the raw payload is already a column — and makes
  * the *parse paths* first-class relational operators:
  *
  * - S1/S8 pagination → a page-plan DataFrame whose rows ARE the work
  *   partition (replaces the Redis work queue K6/Q7: Spark's scheduler
  *   distributes the plan's partitions).
  * - S8 JSONP page parse (`eastmoney.py:63-96`): strip wrapper,
  *   `from_json` with an explicit item schema, explode rows.
  * - S2/S7 HTML article parse (`newsfilter.py:95-109`, `etnet.py:183-246`):
  *   title/content extraction over a tag-stripped body.
  */
object FixtureSource {

  /** Pagination as partitions: one row per page with its offset window
    * (`newsfilter.py:111-151` advances `from` by `size`; its bug — never
    * re-fetching after the first page — is NOT reproduced). Repartitioned
    * so each page lands in its own task, the way the reference's queue
    * spread pages over workers. */
  def pagePlan(spark: SparkSession, totalRows: Long, pageSize: Int,
               maxPages: Int = Int.MaxValue): DataFrame = {
    // A7 ceil-div total-pages derivation; L2 `max_page` cap (etnet.py:52)
    val numPages = math.min(((totalRows + pageSize - 1) / pageSize).toInt, maxPages)
    spark.range(numPages)
      .select(col("id").cast("int").as("page"),
        (col("id") * pageSize).cast("long").as("offset"),
        least(lit(totalRows) - col("id") * pageSize, lit(pageSize))
          .cast("int").as("limit"))
      .repartition(math.max(numPages, 1))
  }

  /** S8: parse a JSONP payload column into typed rows: strip the callback
    * wrapper, parse `{"hits": [...]}`-shaped payloads with an explicit
    * schema, one output row per item. */
  def parseJsonpItems(df: DataFrame, payload: Column, itemSchema: StructType,
                      itemsField: String = "hits"): DataFrame = {
    val parsed = from_json(TextOps.jsonpStrip(payload),
      new StructType().add(itemsField, ArrayType(itemSchema)))
    df.withColumn("__item", explode(parsed.getField(itemsField)))
      .select(col("*"), col("__item.*")).drop("__item")
  }

  /** S2/S7: extract (title, body) from a raw HTML column — title from the
    * first <title>/<h1>, body from the tag-stripped remainder. */
  def parseArticleHtml(html: Column): Column = {
    val title = TextOps.htmlStrip(
      regexp_extract(html, "(?is)<(?:title|h1)[^>]*>(.*?)</(?:title|h1)>", 1))
    struct(title.as("title"), TextOps.htmlStrip(html).as("body"))
  }
}
