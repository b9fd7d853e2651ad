package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** The q166 INVARIANT, independent of the oracle's aggregate view: after
  * cluster-safe reassignment, no near-dup pair may span two splits — the
  * exact property q163 reports violations of under the naive doc-level
  * split. Checked on sf0.001 by recomputing the pair set and joining it
  * to each side's reassigned split. */
class ClusterSafeSplitSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q166: no near-dup pair spans two splits after reassignment") {
    val s = spark
    val d = graft.Tables(s, dir, "documents")
    val sh = d.select(col("doc_id"),
      graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))
    val pairs = MinHashLSH.nearDupPairsHashed(sh, "doc_id", "sh",
      numHashes = 64, numBands = 16, threshold = 0.8)
    val clusters = Clusters.assign(pairs, "doc_a", "doc_b")
    val rep = d.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("rep"))
    val bucket = pmod(graft.text.TextOps.md5Int32(col("text")), lit(100))
    val repSplit = d.select(col("doc_id").as("rep"),
      when(bucket < 80, lit("train")).when(bucket < 90, lit("valid"))
        .otherwise(lit("test")).as("split"))
    val assigned = rep.join(repSplit, "rep").select("doc_id", "split")
    val crossSplit = pairs
      .join(assigned.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(assigned.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(crossSplit == 0L, s"$crossSplit near-dup pairs span two splits")
    // non-vacuity: the pair set itself is non-empty at this SF
    assert(pairs.limit(1).count() == 1L, "no near-dup pairs at sf0.001 — vacuous")
  }

  test("q166 query reports every doc exactly once across splits") {
    val s = spark
    val out = DedupQueries.defs("q166_cluster_safe_split")(s, dir)
      .agg(sum("n_docs")).head().getLong(0)
    val total = graft.Tables(s, dir, "documents").count()
    assert(out == total, s"split member counts $out != corpus size $total")
  }
}
