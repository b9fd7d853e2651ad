package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank by iterative join-aggregation — centrality over the
  * kNN similarity graph ranks prototypical documents (graph-based data
  * selection), the same shape GraphX's `staticPageRank` computes but as
  * pure DataFrame ops: no RDD round-trip, Catalyst/AQE plan each round,
  * and the decimal-sum trick makes every round bit-identical across any
  * partitioning (and against a DuckDB oracle — [[graft.similarity.Pca]]'s
  * pattern applied to graph iteration).
  *
  * Per round: in(v) = Σ_{u→v} pr(u)·recip(u), then
  * pr'(v) = teleport + damping·in(v). Each per-edge contribution is
  * DECIMAL(28,12)-quantized before the per-destination sum; recip(u) =
  * 1/outdeg(u) is itself decimal-quantized once at edge build.
  *
  * Determinism contract: callers pass `teleportNumerator` (e.g. 0.15)
  * instead of deriving it as 1 − damping — `1.0 - 0.85` is one ulp OFF
  * the double literal `0.15`, and an oracle writes the literal.
  *
  * Dangling (no-out-edge) node mass is DROPPED, not redistributed —
  * deterministic and one less all-to-all per round; the teleport term
  * keeps every rank positive. Standard for web-scale implementations.
  *
  * Scale shape: the edge list (checkpointed once, with its quantized
  * reciprocal) is the only corpus-sized table; each round is one
  * edge⋈rank join + one map-side-combined aggregation + one node-sized
  * left join, and `localCheckpoint` caps the lineage (the Clusters
  * pattern). Driver holds nothing but the node count.
  */
object PageRank {

  private val Dec = "decimal(28,12)"

  /** `iters` rounds over `edges`; returns (idCol, pr). */
  def run(nodes: DataFrame, idCol: String, edges: DataFrame,
          srcCol: String, dstCol: String, iters: Int,
          damping: Double = 0.85, teleportNumerator: Double = 0.15): DataFrame = {
    val deg = edges.groupBy(srcCol).agg(count(lit(1)).as("__outdeg"))
    val e = edges.join(deg, srcCol)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        (lit(1.0) / col("__outdeg")).cast(Dec).cast("double").as("__recip"))
    iterate(nodes, idCol, e, iters, damping, teleportNumerator)
  }

  /** Weighted variant: each out-edge carries `weightCol` (e.g. cosine
    * similarity) and a source's rank splits proportionally to weight,
    * recip(u→v) = w/Σ_out w. Weights are decimal-quantized BEFORE the
    * per-source sum (the raw doubles' sum would be partition-order
    * dependent), then the share is one double division re-quantized —
    * never a decimal÷decimal (engines disagree on result scale rules). */
  def runWeighted(nodes: DataFrame, idCol: String, edges: DataFrame,
                  srcCol: String, dstCol: String, weightCol: String,
                  iters: Int, damping: Double = 0.85,
                  teleportNumerator: Double = 0.15): DataFrame = {
    val w = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast(Dec).as("__w"))
    val sw = w.groupBy("__src").agg(sum("__w").as("__sumw"))
    val e = w.join(sw, "__src")
      .select(col("__src"), col("__dst"),
        (col("__w").cast("double") / col("__sumw").cast("double"))
          .cast(Dec).cast("double").as("__recip"))
    iterate(nodes, idCol, e, iters, damping, teleportNumerator)
  }

  /** The shared damped-iteration core over a prepared
    * (__src, __dst, __recip) edge table. */
  private def iterate(nodes: DataFrame, idCol: String, edgesRecip: DataFrame,
                      iters: Int, damping: Double,
                      teleportNumerator: Double): DataFrame = {
    val e = edgesRecip.localCheckpoint(true)
    val ids = nodes.select(col(idCol).as("__id")).localCheckpoint(true)
    val n = ids.count()
    var pr = ids.withColumn("__pr", lit(1.0 / n))
    var lastCkpt: DataFrame = null
    for (round <- 1 to iters) {
      val in = e.join(pr.select(col("__id").as("__src"), col("__pr")), "__src")
        .select(col("__dst").as("__id"),
          (col("__pr") * col("__recip")).cast(Dec).as("__c"))
        .groupBy("__id").agg(sum("__c").cast("double").as("__in"))
      pr = ids.join(in, Seq("__id"), "left")
        .select(col("__id"),
          (lit(teleportNumerator / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("__pr"))
      // checkpoint every OTHER round (and the last): caps lineage growth
      // at two join+agg layers while halving the eager materializations —
      // checkpoint cadence is a lineage concern only, the decimal
      // quantization makes every round's VALUES partitioning-independent.
      // Each new eager checkpoint makes its PREDECESSOR's blocks dead —
      // release per round instead of accumulating node-cardinality
      // tables × rounds until a driver GC (the Clusters lesson).
      if (round % 2 == 0 || round == iters) {
        pr = pr.localCheckpoint(true)
        if (lastCkpt != null) graft.ops.Checkpoints.release(lastCkpt)
        lastCkpt = pr
      }
    }
    // the returned plan reads only the FINAL pr checkpoint (iters >= 1
    // always checkpoints the last round); edges/ids were loop-only
    if (iters >= 1) { Checkpoints.release(e); Checkpoints.release(ids) }
    pr.select(col("__id").as(idCol), col("__pr").as("pr"))
  }
}
