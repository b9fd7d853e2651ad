package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * cluster the embedding space, then compare vectors ONLY within their
  * cluster and drop every vector that has a lower-id neighbour above the
  * cosine threshold (keep-lowest-id, mirroring the keep-first contract of
  * the exact dedup gate F8 / `/root/reference/src/base.py:210-218` at
  * embedding granularity).
  *
  * Scale shape: the all-pairs O(n²) comparison is confined to single
  * cells — the self-join is an equi-join on the cell id, so the shuffle
  * partitions by cell and each task compares one cell's members. With k
  * centroids sized so cells hold ~n/k vectors, the work is n²/k spread
  * over k tasks; in production k grows with the corpus (the IVF index the
  * cells come from is maintained by `IvfFlat.recomputeCentroids`), so
  * per-task cost stays bounded. No corpus-wide cross join ever exists in
  * the plan.
  */
object SemanticDedup {

  /** Dropped-vector report over an assigned clustering.
    *
    * @param cells  (idCol, cell) assignment, e.g. `IvfFlat.assign` output
    * @param vecs   (idCol, vecCol) the embeddings
    * @param tau    cosine threshold at or above which a pair is a dup
    * @return one row per DROPPED vector: (idCol, cell, keeper = lowest-id
    *         within-cell neighbour ≥ tau, n_dups = how many such
    *         neighbours, max_sim = highest cosine among them)
    */
  def dropReport(cells: DataFrame, vecs: DataFrame, idCol: String,
                 vecCol: String, tau: Double): DataFrame = {
    val withVec = cells.select(col(idCol), col("cell"))
      .join(vecs.select(col(idCol), col(vecCol)), Seq(idCol))
    val l = withVec.select(col(idCol).as("__a"), col("cell"), col(vecCol).as("__va"))
    val r = withVec.select(col(idCol).as("__b"), col("cell"), col(vecCol).as("__vb"))
    l.join(r, Seq("cell"))
      .filter(col("__a") < col("__b"))
      .withColumn("__sim", Cosine.cosine(col("__va"), col("__vb")))
      .filter(col("__sim") >= tau)
      .groupBy(col("__b").as(idCol), col("cell"))
      .agg(min(col("__a")).as("keeper"),
        count(lit(1)).as("n_dups"),
        max(col("__sim")).as("max_sim"))
  }

  /** The surviving rows: everything `dropReport` does not name. */
  def survivors(cells: DataFrame, vecs: DataFrame, idCol: String,
                vecCol: String, tau: Double): DataFrame =
    vecs.join(dropReport(cells, vecs, idCol, vecCol, tau).select(idCol),
      Seq(idCol), "left_anti")
}
