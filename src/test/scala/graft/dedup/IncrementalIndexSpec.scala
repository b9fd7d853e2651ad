package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.SparkSpec
import graft.sinks.Sinks

/** The INCREMENTAL near-dup index deployment shape, end-to-end: the
  * history corpus's band rows (`MinHashLSH.historyBandRows`) are written
  * ONCE as a bucketed table on the band `key`, and every nightly batch
  * probes it — the scaladoc's "persist the index so each batch joins
  * against it without recomputing (or reshuffling) the corpus", proven
  * rather than asserted:
  *
  *  1. probing the bucketed index through `nearDupAgainstBandRows`
  *     returns EXACTLY the direct `nearDupAgainstHashed` pairs, and
  *  2. the band join's plan contains NO shuffle above the bucketed index
  *     scan — at 100 TB the index is corpus-sized (numBands rows/doc)
  *     and re-shuffling it per nightly batch is exactly the cost this
  *     shape deletes; only the (small) batch side exchanges.
  */
class IncrementalIndexSpec extends SparkSpec {

  private def hashed(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))

  test("bucketed band index: probe ≡ direct nearDupAgainstHashed") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = hashed(docs.filter(col("source") === "src0"))
    val batch = hashed(docs.filter(col("source") =!= "src0"))
    val direct = MinHashLSH.nearDupAgainstHashed(batch, hist, "doc_id", "sh",
        numHashes = 64, numBands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct.nonEmpty, "fixture must produce cross-corpus near-dups")
    Sinks.bucketedWriteKeys(
      MinHashLSH.historyBandRows(hist, "doc_id", "sh", 64, 16),
      "idx_bands", Seq("band", "key"), numBuckets = 8,
      sortCols = Seq("band", "key"))
    try {
      val probed = MinHashLSH.nearDupAgainstBandRows(
          batch, spark.table("idx_bands"), hist, "doc_id", "sh",
          numHashes = 64, numBands = 16, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(probed == direct, s"probe ${probed.size} pairs != direct ${direct.size}")
    } finally spark.sql("DROP TABLE IF EXISTS idx_bands")
  }

  test("the probe's band join never re-shuffles the bucketed index side") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = hashed(docs.filter(col("source") === "src0"))
    val batch = hashed(docs.filter(col("source") =!= "src0"))
    Sinks.bucketedWriteKeys(
      MinHashLSH.historyBandRows(hist, "doc_id", "sh", 64, 16),
      "idx_bands", Seq("band", "key"), numBuckets = 8,
      sortCols = Seq("band", "key"))
    try {
      // the deployment join: batch band rows against the persisted index
      // on (band, key). The bucket columns are the join's FULL key set —
      // co-partitioning needs both sides on the same partitioning
      // function, so bucketing a subset re-shuffles (see
      // Sinks.bucketedWriteKeys). merge hint keeps broadcast out of the
      // proof (a broadcast would ALSO avoid re-shuffling the index, but
      // the 100 TB index doesn't broadcast).
      val batchBands = MinHashLSH.historyBandRows(batch, "doc_id", "sh", 64, 16)
        .withColumnRenamed("b", "a")
      val joined = spark.table("idx_bands").hint("merge")
        .join(batchBands, Seq("band", "key"))
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan = unwrap(joined.queryExecution.executedPlan)
      def containsIdxScan(n: SparkPlan): Boolean =
        (n.children.isEmpty && n.toString.contains("idx_bands")) ||
          n.children.exists(containsIdxScan)
      assert(containsIdxScan(plan), s"no idx_bands scan in plan:\n$plan")
      val offenders = plan.collect {
        case e: ShuffleExchangeLike if containsIdxScan(e) => e
      }
      assert(offenders.isEmpty,
        s"bucketed index was re-shuffled:\n${plan.toString.take(4000)}")
      assert(joined.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS idx_bands")
  }
}
