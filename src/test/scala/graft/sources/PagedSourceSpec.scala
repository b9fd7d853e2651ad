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
