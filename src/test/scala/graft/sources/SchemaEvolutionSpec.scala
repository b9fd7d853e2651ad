package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins schema-evolution reads: a corpus written in snapshots whose
  * schema GAINS columns over time (a crawl adding `lang_conf`, a rerun
  * adding `quality`) must stay readable as one table. Two supported
  * paths, each with a sharp edge this spec documents:
  *
  *  - `mergeSchema` on the parquet read: the union schema is computed
  *    from footers at planning time; old files surface the new columns
  *    as NULL. The edge: mergeSchema is OFF by default (first footer
  *    wins — silently DROPPING late columns when the path glob happens
  *    to list an old file first), so the read must opt in explicitly.
  *
  *  - `unionByName(_, allowMissingColumns = true)` when the snapshots
  *    are loaded separately: positional union would misalign columns
  *    that shifted position between snapshots; by-name union with
  *    missing-column fill is the only safe combinator.
  *
  * At 100 TB, re-writing history to the newest schema is not an option;
  * these two reads are what "append-only schema evolution" means.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema read unions snapshot schemas; old files yield NULLs") {
    import spark.implicits._
    val root = Files.createTempDirectory("evo").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$root/snap=2025-01")
    Seq((3L, "gamma", "en", 0.93), (4L, "delta", "de", 0.81))
      .toDF("doc_id", "text", "lang", "lang_conf")
      .write.parquet(s"$root/snap=2025-02")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toSeq ==
      Seq("doc_id", "lang", "lang_conf", "snap", "text"))
    val rows = merged.orderBy("doc_id")
      .select("doc_id", "lang", "lang_conf").collect()
    assert(rows.take(2).forall(r => r.isNullAt(1) && r.isNullAt(2)),
      "pre-evolution rows must surface the late columns as NULL")
    assert(rows(2).getString(1) == "en" && rows(3).getDouble(2) == 0.81)
  }

  test("unionByName with allowMissingColumns aligns shifted snapshot schemas") {
    import spark.implicits._
    // snapshot 2 both ADDS a column and REORDERS the shared ones —
    // positional union would pair text with lang and fail or corrupt
    val s1 = Seq((1L, "alpha")).toDF("doc_id", "text")
    val s2 = Seq(("en", 3L, "gamma")).toDF("lang", "doc_id", "text")
    val u = s1.unionByName(s2, allowMissingColumns = true)
    val got = u.orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L))
    assert(got.map(_.getAs[String]("text")).toSeq == Seq("alpha", "gamma"))
    assert(got(0).getAs[String]("lang") == null &&
      got(1).getAs[String]("lang") == "en")
  }
}
