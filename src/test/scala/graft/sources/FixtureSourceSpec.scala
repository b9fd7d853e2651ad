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
