package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class FixtureSourceSpec extends SparkSpec {
  import spark.implicits._

  test("pagePlan covers all rows with a partial last page (S1/S8 pagination)") {
    val plan = FixtureSource.pagePlan(spark, totalRows = 230, pageSize = 100)
      .orderBy("page").as[(Int, Long, Int)].collect()
    assert(plan.sameElements(Array((0, 0L, 100), (1, 100L, 100), (2, 200L, 30))))
    assert(plan.map(_._3.toLong).sum == 230)
  }

  test("baikeNameFromSerp: baike mention without the title shape is NULL, not \"\"") {
    // regexp_extract returns "" (not null) on no-match; the documented
    // contract is null for "no baike name", and an empty string would
    // survive isNotNull and join on an empty entity.
    val html = """<span class="c-tools" data-tools="{url:'x',note:'百度百科'}"></span>"""
    val got = Seq(html).toDF("html")
      .select(FixtureSource.baikeNameFromSerp(col("html")).as("n"))
      .collect()(0)
    assert(got.isNullAt(0), s"expected null, got '${got.getString(0)}'")
  }

  test("pagePlan survives page counts beyond Int.MaxValue (ceil-div stays long)") {
    // Pre-fix, ((totalRows+pageSize-1)/pageSize).toInt wrapped NEGATIVE
    // for 2^31+9 pages, min(negative, cap) stayed negative, and
    // spark.range(negative) planned ZERO pages — silent total data loss.
    val plan = FixtureSource.pagePlan(spark,
      totalRows = Int.MaxValue.toLong + 10, pageSize = 1, maxPages = 3)
    val rows = plan.select("page", "offset", "limit")
      .as[(Int, Long, Int)].collect().sortBy(_._1)
    assert(rows.length == 3, s"expected the 3 capped pages, got ${rows.length}")
    assert(rows.map(_._2).sameElements(Array(0L, 1L, 2L)))
  }

  test("pagePlan honors the max_page cap (L2, etnet.py:52)") {
    val plan = FixtureSource.pagePlan(spark, totalRows = 1000, pageSize = 100, maxPages = 5)
    assert(plan.count() == 5)
  }

  test("pagePlan puts each page in its own partition") {
    val plan = FixtureSource.pagePlan(spark, 500, 100)
    assert(plan.rdd.getNumPartitions == 5)
  }

  test("parseJsonpItems: strip + schema'd parse + explode (S8 eastmoney.py:63-96)") {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/fixtures/page.jsonp").getPath))).trim
    val itemSchema = new StructType()
      .add("art_code", StringType).add("title", StringType).add("notice_date", StringType)
    val out = FixtureSource.parseJsonpItems(
        Seq(raw).toDF("payload"), col("payload"), itemSchema)
      .select("art_code", "title").as[(String, String)].collect()
    assert(out.sameElements(Array(("A1", "First report"), ("A2", "Second report"))))
  }

  test("two-step encyclopedia resolve: search links -> filter -> fetch join (S15/S16)") {
    // the wiki/baike pattern (wiki_utils.py:27-64, baidu_api.py:59-81):
    // step 1 a search-results relation per query, step 2 pick the first
    // allowed encyclopedia link, step 3 join to the fetched-pages relation
    // and parse — fetch is fixture-abstracted, the relational shape is real
    val serp = Seq(
      ("apple", 1, "https://ads.example.com/x"),
      ("apple", 2, "https://en.wikipedia.org/wiki/Apple_Inc."),
      ("apple", 3, "https://en.wikipedia.org/wiki/Apple"),
      ("tesla", 1, "https://en.wikipedia.org/wiki/Tesla,_Inc.")
    ).toDF("query", "rank", "link")
    val pages = Seq(
      ("https://en.wikipedia.org/wiki/Apple_Inc.",
        "<html><title>Apple Inc.</title><p>American company.</p></html>"),
      ("https://en.wikipedia.org/wiki/Tesla,_Inc.",
        "<html><title>Tesla, Inc.</title><p>EV maker.</p></html>")
    ).toDF("link", "html")

    val firstWiki = serp
      .filter(col("link").rlike("^https://en\\.wikipedia\\.org/wiki/"))
      .groupBy("query").agg(min_by(col("link"), col("rank")).as("link"))
    val out = firstWiki.join(pages, Seq("link"))
      .select(col("query"),
        FixtureSource.parseArticleHtml(col("html")).getField("title").as("title"))
      .as[(String, String)].collect().toSet
    assert(out == Set(("apple", "Apple Inc."), ("tesla", "Tesla, Inc.")))
  }

  test("S16 Baidu Baike two-step resolve: SERP zh-name -> baike para parse (baidu_api.py:31-81)") {
    def load(name: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(s"/fixtures/$name").getPath)), "UTF-8")
    // step 1 (baidu_api.py:59-81): resolve the Chinese entity name from
    // the SERP's 百度百科 tool-span; a page with no baike link yields null
    val serp = Seq(("xiaomi", load("serp_baidu.html")), ("nolink", "<html></html>"))
      .toDF("query", "html")
    val named = serp.select(col("query"),
      FixtureSource.baikeNameFromSerp(col("html")).as("zh_name"))
    val byQuery = named.as[(String, String)].collect().toMap
    assert(byQuery("xiaomi") == "小米集团")
    assert(byQuery("nolink") == null)
    // step 2 (baidu_api.py:31-55): join resolved names to the fetched
    // baike pages and split div.para blocks into summary + content
    val pages = Seq(("小米集团", load("baike.html"))).toDF("zh_name", "html")
    val out = named.filter(col("zh_name").isNotNull)
      .join(pages, Seq("zh_name"))
      .select(col("query"), FixtureSource.parseBaikeParas(col("html")).as("p"))
      .select("query", "p.summary", "p.content")
      .as[(String, String, String)].collect()
    assert(out.length == 1)
    val (q, summary, content) = out(0)
    assert(q == "xiaomi")
    assert(summary == "小米集团是一家消费电子公司。 成立于2010年。")
    assert(content == "公司主要产品包括 智能手机 与IoT设备。2018年在香港上市。 股票代码1810。")
  }

  test("parseBaikeParas: para-less page falls back to empty summary/content (baidu_api.py:51-55)") {
    val row = Seq("<html><p>no paras here</p></html>").toDF("h")
      .select(FixtureSource.parseBaikeParas(col("h")).as("p"))
      .select("p.summary", "p.content").as[(String, String)].collect()(0)
    assert(row == (("", "")))
  }

  test("parseArticleHtml extracts title and tag-stripped body (S2/S7)") {
    val html = "<html><head><title>Quarterly Results</title></head>" +
      "<body><script>x()</script><p>Revenue grew <b>12%</b> yoy.</p></body></html>"
    val row = Seq(html).toDF("h")
      .select(FixtureSource.parseArticleHtml(col("h")).as("a"))
      .select("a.title", "a.body").as[(String, String)].collect()(0)
    assert(row._1 == "Quarterly Results")
    assert(row._2 == "Quarterly Results Revenue grew 12% yoy.")
  }
}
