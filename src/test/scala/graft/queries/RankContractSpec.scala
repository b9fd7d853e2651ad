package graft.queries

import graft.SparkSpec

/** The corpus-B rank contracts (queries = 10 lowest vec_ids, seeds = 16
  * lowest corpus ids) replaced literal id thresholds; their tau helpers
  * must preserve the literals' clean EMPTY behavior on degenerate
  * corpora — an empty table previously produced an empty filter result,
  * and must not turn into an NPE from a null max aggregate. */
class RankContractSpec extends SparkSpec {
  import spark.implicits._

  test("similarity split on an EMPTY embeddings table returns empty, not NPE") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rcs").toString
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q21_cosine_topk")(spark, dir).collect()
    assert(out.isEmpty)
    val ann = graft.SparkEntry.queries("q135_filtered_ann")(spark, dir).collect()
    assert(ann.isEmpty)
  }

  test("zipfRank spans [1, n] inclusive and concentrates mass on rank 1") {
    import org.apache.spark.sql.functions._
    val n = 1000L
    val u = spark.range(0, 200000)
      .select(graft.ZipfCorpus.uniformOf(col("id")).as("u"))
    val r = u.select(graft.ZipfCorpus.zipfRank(col("u"), n, 1.2).as("r"))
    val stats = r.agg(min("r"), max("r"), count(lit(1))).head()
    assert(stats.getLong(0) == 1L, "rank 1 must be reachable (was ceil-gated)")
    assert(stats.getLong(1) <= n)
    val share1 = r.filter(col("r") === 1).count().toDouble / stats.getLong(2)
    // P(rank=1) = (1 - 2^(1-s)) / (1 - (n+1)^(1-s)) ≈ 0.167 at n=1000, s=1.2
    assert(share1 > 0.12 && share1 < 0.22, s"rank-1 share $share1")
  }
}
