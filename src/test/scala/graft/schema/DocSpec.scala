package graft.schema

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DocSpec extends SparkSpec {
  import spark.implicits._

  private val doc = Doc(
    unique_identifier = "u1", source_id = "u1", text_hash = "h",
    source = "reddit", title = Some("t"), text = Some("body"),
    tickers = Seq("TSLA", "MSFT"), sentiment = Some(0.4),
    sector_code = Some(40101010), source_link = Some("https://x"),
    time = java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
    retrieval_time = java.sql.Timestamp.valueOf("2024-03-02 00:00:00"),
    just_insert = true,
    keywords = Seq(Keyword("earnings", 0.9)),
    props = Map("k" -> "v"))

  test("Doc dataset round-trips through parquet with nested columns intact") {
    val path = Files.createTempDirectory("graft-doc").resolve("t").toString
    Seq(doc).toDS().write.parquet(path)
    val back = spark.read.parquet(path).as[Doc].collect()(0)
    assert(back == doc)
  }

  test("schema exposes the reference's multi-valued/nested columns (§1.2)") {
    val f = Doc.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("tickers") == "array")
    assert(f("keywords") == "array")
    assert(f("props") == "map")
    assert(f("time") == "timestamp")
  }

  test("approx_count_distinct (HLL) tracks exact distinct within 5% (corpus stats at scale)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val row = ev.agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id").as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }
}
