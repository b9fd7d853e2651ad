package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private lazy val posts = spark.read
    .option("multiLine", "false")
    .json(fixture("posts.json"))
  private lazy val universe = spark.read
    .option("header", "true").csv(fixture("universe.csv"))
  private def emptyHistory = Seq.empty[String].toDF("text_hash")
  private val clock = lit("2024-03-02 00:00:00").cast("timestamp")

  test("ingest end-to-end: gates compose — removed/empty/stop-ticker/unknown/dup all dropped") {
    val docs = Ingest.ingest(posts, universe, emptyHistory, clock)
    val byId = docs.collect().map(d => d.unique_identifier -> d).toMap
    // survivors: 101 (dup keeper over 106), 102, 108
    assert(byId.keySet == Set("101", "102", "108"))
    assert(byId("101").tickers == Seq("TSLA"))
    assert(byId("102").tickers == Seq("MSFT"))
    assert(byId("108").tickers == Seq("AAPL", "GME", "MSFT"))
    assert(byId.values.forall(_.just_insert))
    assert(byId("101").time.toString == "2024-03-01 10:15:00.0")
  }

  test("ingest is idempotent under the dedup gate (reference test_reddit.py:12-15 analog)") {
    val run1 = Ingest.ingest(posts, universe, emptyHistory, clock)
    val history = run1.select(col("text_hash")).toDF()
    val run2 = Ingest.ingest(posts, universe, history, clock)
    assert(run2.count() == 0)
  }

  test("partial history: only unseen docs pass the gate") {
    val run1 = Ingest.ingest(posts, universe, emptyHistory, clock)
    val partial = run1.filter(col("unique_identifier") === "101")
      .select(col("text_hash")).toDF()
    val run2 = Ingest.ingest(posts, universe, partial, clock)
    assert(run2.select("unique_identifier").as[String].collect().toSet == Set("102", "108"))
  }

  test("filterValidPosts: F2/F3 drop removed and placeholder bodies") {
    val kept = Ingest.filterValidPosts(posts).select("id").as[Long].collect().toSet
    assert(!kept.contains(103L) && !kept.contains(104L))
    assert(kept.contains(101L))
  }
}
