package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-pages")
    Files.writeString(d.resolve("page-000.jsonl"),
      """{"id":1,"title":"alpha"}
        |{"id":2,"title":"beta"}
        |""".stripMargin)
    Files.writeString(d.resolve("page-001.jsonl"),
      """{"id":3,"title":"gamma"}
        |{"id":4,"title":"delta"}
        |{"id":5,"title":"epsilon"}
        |""".stripMargin)
    d.toString
  }

  private def read() =
    spark.read.format("graft.sources.PagedSource").option("path", dir).load()

  test("pages become partitions; all rows readable with page provenance") {
    val df = read()
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.select("id", "page", "title")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(rows.length == 5)
    assert(rows(0) == (1L, 0, "alpha"))
    assert(rows(4) == (5L, 1, "epsilon"))
  }

  test("malformed lines (no id) are dropped, never fabricated as id = -1") {
    // Pre-fix a line without an id produced a live (id = -1) row in a
    // non-nullable column, passing pushed predicates like id < 10.
    val d = Files.createTempDirectory("graft-badpages")
    Files.writeString(d.resolve("page-000.jsonl"),
      """{"id":7,"title":"ok"}
        |{"title":"no id here"}
        |not json at all
        |""".stripMargin)
    val df = spark.read.format("graft.sources.PagedSource")
      .option("path", d.toString).load()
    val ids = df.select("id").as[Long].collect().toSeq
    assert(ids == Seq(7L), s"malformed lines leaked: $ids")
    assert(df.filter(col("id") < 10).count() == 1)
  }

  test("a missing or non-directory path fails planning with a clear error") {
    val df = spark.read.format("graft.sources.PagedSource")
      .option("path", "/no/such/dir").load()
    val e = intercept[Exception](df.count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a readable directory")),
      s"expected the readable-directory message, got: ${msgs(e)}")
  }

  test("id filters push into the source (SupportsPushDownFilters)") {
    val df = read().filter(col("id") >= 3L)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PagedScan"), scan)
    assert(scan.contains("GreaterThanOrEqual(id,3)"), s"pushed filter missing:\n$scan")
    assert(df.select("id").as[Long].collect().sorted.sameElements(Array(3L, 4L, 5L)))
  }

  test("non-id filters stay residual but results remain correct") {
    val df = read().filter(col("title").startsWith("d"))
    assert(df.select("id").as[Long].collect().sameElements(Array(4L)))
  }

  test("column pruning reaches the reader (SupportsPushDownRequiredColumns)") {
    val df = read().select("title")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PagedScan"), scan)
    assert(df.as[String].collect().sorted.head == "alpha")
  }
}
