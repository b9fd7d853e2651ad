package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete nodes
  * whose (undirected) degree is below k; what survives is the maximal
  * subgraph with minimum degree ≥ k. On a kNN similarity graph the
  * k-core isolates dense semantic neighborhoods — the "cluster core"
  * complement of `ops/Triangles`' local clustering coefficient, used to
  * pick prototype-rich regions for subsampling (high-core) vs
  * outlier/noise sweeps (core-less).
  *
  * Determinism contract: the result equals EXACTLY `rounds` unrolled
  * peeling rounds — after the fixpoint every further round is a no-op,
  * so "enough rounds" equals "converged", and the oracle can mirror
  * the algorithm as `rounds` unrolled CTEs with zero driver state
  * ([[oracleRounds]], the `PageRank.oracleSql` pattern). Peeling is
  * monotone, so a round count ≥ the peel depth is exact (kNN graphs
  * peel in a handful of rounds — bounded out-degree); the spec asserts
  * convergence. The LOOP may therefore stop at the fixpoint: a round
  * that deletes no edge proves all remaining rounds identical (edges
  * only shrink, and the next round's inputs equal this round's), so
  * the early exit is result-invisible — it exists because q134 runs
  * THREE peels whose k=2/3 members converge in a round or two, and
  * 24 materialized no-op rounds at ×100 cost ~35 s of pure overhead.
  * The per-round count() reads an already-materialized localCheckpoint.
  *
  * Scale per round: two windowed degree counts (one exchange per edge
  * endpoint — deg(x) is the row count of x on either side of a
  * symmetrized edge list), no joins; `localCheckpoint` truncates the
  * iterative lineage (the `Clusters` lesson). Edge state only ever
  * shrinks.
  */
object KCore {

  /** Symmetrize + dedupe + drop self-loops — the k-INDEPENDENT first
    * step of [[kCore]], split out and eagerly materialized so several
    * peels over the same graph (q134's k = 2/3/4 core-size profile)
    * share ONE distinct-shuffle + checkpoint instead of paying it per k.
    * Returns columns (a, b). */
  def symmetrize(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)

  /** Nodes of the k-core of the (symmetrized, de-duplicated, loop-free)
    * graph, with their within-core degree. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame =
    kCoreOfSymmetrized(symmetrize(edges, srcCol, dstCol), k, rounds)

  /** [[kCore]] over edges ALREADY passed through [[symmetrize]] (both
    * directions present, deduped, loop-free, materialized, columns
    * (a, b)) — the entry point for sharing the symmetrization across
    * several k. */
  def kCoreOfSymmetrized(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got k=$k rounds=$rounds")
    var e = sym
    var remaining = e.count()
    var converged = false
    // Per-round degrees as WINDOW counts over the two exchanges the
    // round pays anyway (the Clusters.largeStar lesson): in a
    // symmetrized graph the a-side row count of node x IS deg(x), and so
    // is the b-side count, so `deg(a) >= k AND deg(b) >= k` filters the
    // same edge set the old degree-agg + two semi-joins kept — at two
    // exchanges and zero joins per round instead of three exchanges and
    // two joins.
    val wa = org.apache.spark.sql.expressions.Window.partitionBy("a")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("b")
    (1 to rounds).foreach { _ =>
      if (!converged) {
        val prev = e
        e = e.withColumn("__da", count(lit(1)).over(wa))
          .withColumn("__db", count(lit(1)).over(wb))
          .filter(col("__da") >= k && col("__db") >= k)
          .select("a", "b")
          .localCheckpoint(true)
        // the eager checkpoint makes the previous round's blocks dead —
        // release per round (the Clusters lesson), EXCEPT the caller's
        // input `sym`, which q134-style callers share across several k
        if (prev ne sym) graft.ops.Checkpoints.release(prev)
        val now = e.count()
        converged = now == remaining // fixpoint: every further round is a no-op
        remaining = now
      }
    }
    e.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a").as("node"), col("deg"))
  }

  /** The same peeling as `rounds` unrolled SQL CTEs over a directed
    * edge CTE named `ke(src, dst)`; leaves the result in a CTE named
    * `<prefix>kcore_final(a, deg)`. Caller appends the SELECT. The
    * `prefix` namespaces every CTE so several peels (different k) can
    * coexist in ONE oracle query (q134's core-size profile). */
  def oracleRounds(k: Int, rounds: Int, prefix: String = ""): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${prefix}e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
        |  SELECT src AS a, dst AS b FROM ke
        |  UNION ALL SELECT dst AS a, src AS b FROM ke) WHERE a <> b),
        |""".stripMargin)
    (1 to rounds).foreach { i =>
      sb.append(
        s"""${prefix}alive$i AS MATERIALIZED (SELECT a FROM (
           |  SELECT a, count(*) AS deg FROM ${prefix}e${i - 1} GROUP BY 1) WHERE deg >= $k),
           |${prefix}e$i AS MATERIALIZED (SELECT e.a, e.b FROM ${prefix}e${i - 1} e
           |  JOIN ${prefix}alive$i x ON e.a = x.a JOIN ${prefix}alive$i y ON e.b = y.a),
           |""".stripMargin)
    }
    sb.append(
      s"${prefix}kcore_final AS (SELECT a, count(*) AS deg FROM ${prefix}e$rounds GROUP BY 1)")
    sb.toString
  }
}
