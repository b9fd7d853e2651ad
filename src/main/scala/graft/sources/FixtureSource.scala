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
    // A7 ceil-div total-pages derivation; L2 `max_page` cap (etnet.py:52).
    // The ceil-div stays in LONG until after the maxPages min: a .toInt
    // on the raw page count wraps once totalRows/pageSize exceeds
    // Int.MaxValue and silently plans a fraction of the pages (or zero,
    // if the wrap lands negative) — data loss at exactly the scale this
    // planner exists for. After min(—, maxPages) the value provably fits.
    val numPages = math.min((totalRows + pageSize - 1) / pageSize,
      maxPages.toLong).toInt
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

  /** S16 step 2: Baidu-Baike page parse (`baidu_api.py:31-55`): the
    * paragraph text is the `div.para` blocks' tag-stripped contents;
    * summary = first paragraph, content = the remaining paragraphs
    * joined, with newlines and NBSP removed exactly like the reference's
    * post-processing. `get` (0-based) is the ANSI-safe element read —
    * a para-less page yields ("", ""), the reference's empty fallback. */
  def parseBaikeParas(html: Column): Column = {
    val paras = transform(
      regexp_extract_all(html,
        lit("(?is)<div[^>]*class=\"para\"[^>]*>(.*?)</div>"), lit(1)),
      p => regexp_replace(TextOps.htmlStrip(p), "[\\n\\u00A0]", ""))
    struct(
      coalesce(get(paras, lit(0)), lit("")).as("summary"),
      array_join(slice(paras, lit(2), greatest(size(paras) - 1, lit(0))), "").as("content"))
  }

  /** S16 step 1: resolve each query's Chinese entity name from a Baidu
    * SERP payload (`baidu_api.py:59-81`): scan the `c-tools` tool-spans'
    * `data-tools` attributes for a 百度百科 entry and strip the 百度百科
    * suffix off its title. Null when no baike link is on the page (the
    * reference returns the empty tuple). */
  def baikeNameFromSerp(serpHtml: Column): Column = {
    val tools = regexp_extract_all(serpHtml,
      lit("(?is)<span[^>]*class=\"c-tools[^\"]*\"[^>]*data-tools=\"([^\"]*)\""), lit(1))
    val baike = filter(tools, t => t.contains("百度百科"))
    // nullif: regexp_extract returns "" (not null) when the tool span
    // matched the contains-filter but its title is not in the expected
    // shape — the documented contract is NULL for "no baike name", and
    // "" would survive isNotNull filters and join on an empty entity.
    nullif(get(transform(baike,
      t => regexp_extract(t, "title:'(.*?)[_ -]*百度百科", 1)), lit(0)), lit(""))
  }
}
