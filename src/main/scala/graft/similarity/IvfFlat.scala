package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbour search — the second scale path
  * for ANN next to RandomHyperplaneLSH (the "IVF or LSH-bucketed
  * variant" of the north star).
  *
  * Index: partition the corpus into cells by nearest centroid (L2).
  * Query: probe the `nprobe` nearest cells and scan only those.
  * "Training" is deterministic here — the first `numCentroids` corpus
  * vectors serve as centroids; in production swap in k-means centroids,
  * the operator shapes are identical.
  *
  * Scale shape: assignment is a broadcast of the (small) centroid set
  * against the corpus — linear in corpus × centroids, computed once and
  * persisted as a column in a real deployment; search is an equi-join on
  * cell id. No cross join ever touches corpus × queries.
  */
object IvfFlat {

  /** Nearest-centroid assignment: (idCol, cell, dist), deterministic
    * tie-break on centroid id. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cenIdCol: String, cenVecCol: String): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("__dist", Cosine.l2sq(col(vecCol), col(cenVecCol)))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__dist").asc, col(cenIdCol).asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col(cenIdCol).as("cell"), col("__dist").as("dist"))
  }

  /** The `nprobe` nearest cells per query: (idCol, cell, probe_rank). */
  def probes(queries: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cenIdCol: String, cenVecCol: String,
             nprobe: Int): DataFrame = {
    val scored = queries.crossJoin(broadcast(centroids))
      .withColumn("__dist", Cosine.l2sq(col(vecCol), col(cenVecCol)))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__dist").asc, col(cenIdCol).asc)
    scored.withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nprobe)
      .select(col(idCol), col(cenIdCol).as("cell"), col("probe_rank"))
  }

  /** Distinct (query, candidate) pairs from probed cells — an equi-join
    * on the cell id. */
  def candidates(queryProbes: DataFrame, corpusCells: DataFrame,
                 queryIdCol: String, corpusIdCol: String): DataFrame =
    queryProbes.select(col(queryIdCol).as("query_id"), col("cell"))
      .join(corpusCells.select(col(corpusIdCol).as("cand_id"), col("cell")), Seq("cell"))
      .select("query_id", "cand_id").distinct()
}
