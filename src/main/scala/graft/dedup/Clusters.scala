package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair list — the step that turns
  * pairwise similarity output (MinHashLSH / SimHash / embedding LSH)
  * into DEDUP CLUSTERS, so a corpus keeps one representative per group
  * of mutual near-duplicates. (The reference dedups exact ids only,
  * `/root/reference/src/base.py:210-218`; clustering is the north-star
  * generalization a training-data pipeline needs.)
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round, a vertex adopts the minimum label in
  * its closed neighborhood; converged when no label changes. Rounds are
  * pure DataFrame joins/aggregations (shuffle on vertex id — no driver
  * state, no collect), so each round scales like any other equi-join.
  * Rounds needed = graph diameter, and near-dup components are
  * shallow (duplicates of a common source), so convergence is fast; for
  * adversarially long chains switch to the large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce"),
  * which converges in O(log n) rounds with the same join shapes.
  *
  * The driver loop only evaluates a COUNT per round (the changed-label
  * tally); labels stay distributed. `localCheckpoint` truncates the
  * growing lineage each round — without it, round i replans rounds
  * 0..i-1 and iteration time is quadratic. (localCheckpoint stores
  * blocks on executors: fast, but an executor loss mid-loop fails the
  * job and Spark restarts it — acceptable for an idempotent batch
  * operator. For long multi-hour loops on preemptible nodes, switch to
  * reliable `checkpoint` with a checkpoint dir: same call shape,
  * HDFS-durable at the cost of a write per round.)
  */
object Clusters {

  /** (vertex, component) for every vertex in `edges` (both endpoint
    * columns); component = min vertex id reachable. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE: `edges` is typically the lazy plan
    // of a whole near-dup pipeline (shingle → MinHash → band join →
    // verify); without this, every propagation round re-executes it.
    // Edges are pair-sized (≪ corpus), so the checkpoint is cheap.
    val und = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label over the closed neighborhood (self ∪ neighbors)
      val neighborMin = und
        .join(labels.withColumnRenamed("v", "dst"), "dst")
        .groupBy(col("src").as("v"))
        .agg(min("label").as("nmin"))
      val next = labels.join(neighborMin, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("nmin") < col("label")).as("__chg"))
      val mat = next.localCheckpoint(true)
      changed = mat.filter(col("__chg")).count()
      // the eager checkpoint above fully materialized `mat`, so the
      // PREVIOUS round's label blocks are dead — release them now
      // instead of accumulating vertex-cardinality tables × rounds in
      // executor storage until a driver GC + ContextCleaner pass (the
      // round-11 ADVICE leak class, amplified by iteration)
      graft.ops.Checkpoints.release(labels)
      labels = mat.drop("__chg")
      iter += 1
    }
    // the returned plan reads only the FINAL label checkpoint; the edge
    // table was a loop-only input
    graft.ops.Checkpoints.release(und)
    labels.select(col("v"), col("label").as("component"))
  }

  /** Cluster assignment for near-dup pairs + representative flag:
    * (id, cluster, is_representative). */
  def assign(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .select(col("v").as("id"), col("component").as("cluster"),
        (col("v") === col("component")).as("is_representative"))

  // ---- large-star / small-star alternation ------------------------------

  /** Large-star: for each vertex u, link every LARGER neighbor to the
    * min of u's closed neighborhood. Connectivity-preserving; shrinks
    * tall structures toward their minimum.
    *
    * The per-u neighborhood min is a WINDOW over the same `u` the old
    * groupBy+join form shuffled on (the capBuckets lesson: the window
    * slots into one exchange+sort where aggregate-then-join-back pays
    * the aggregation exchange AND a join per round — measured on q92
    * this halved the per-round stage count; identical row set). */
  private def largeStar(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
      .withColumn("m", least(col("u"), min(col("v")).over(w)))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: direct every edge large→small, then link each vertex's
    * smaller neighbors (and itself) to the neighborhood minimum. Same
    * windowed-min shape as [[largeStar]]; the one (u → m) self row the
    * old form unioned in (a second pass over the aggregate) is emitted
    * from the single row whose v IS the minimum (`dir` is distinct, so
    * exactly one row per u qualifies) — one pass, no union, no join. */
  private def smallStar(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .withColumn("m", min(col("v")).over(w))
      .select(explode(when(col("v") === col("m"),
          array(struct(col("v").as("n"), col("m")),
            struct(col("u").as("n"), col("m"))))
        .otherwise(array(struct(col("v").as("n"), col("m"))))).as("nm"))
      .select(col("nm.n").as("u"), col("nm.m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One large-star + small-star round over an (u, v) edge frame —
    * exposed for plan inspection (PlanPeek `starround`): the loop-body
    * shape never appears in the final query's explain because each round
    * materializes behind a localCheckpoint. */
  private[graft] def starRound(e: DataFrame): DataFrame =
    smallStar(largeStar(e))

  /** Connected components by the large-star/small-star alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the adversarial-graph escape hatch for [[connectedComponents]]:
    * label propagation needs DIAMETER rounds, this converges in
    * O(log² n) (O(log n) in practice) with the same equi-join/agg round
    * shape, so a 10⁶-vertex chain costs ~20 rounds instead of 10⁶.
    * Near-dup graphs are shallow, so propagation usually wins on
    * constant factors; prefer this variant when components may be long
    * chains (linked citations, threaded conversations).
    *
    * Convergence = edge-set fixed point, detected by an
    * order-independent signature (count + sum of per-edge hashes) — one
    * tiny aggregate per round, no driver-side edge list. Same output
    * contract as [[connectedComponents]]: (v, component = min reachable
    * vertex), every endpoint of `edges` present. */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 25): DataFrame = {
    val raw = edges.select(col(aCol).as("u"), col(bCol).as("v"))
    // all vertices up front (before the self-loop filter: a vertex seen
    // only in a self-loop still owes an output row)
    val verts = raw.select(col("u").as("v")).union(raw.select("v")).distinct()
      .localCheckpoint(true)
    var e = raw.filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    def signature(d: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal sum: ANSI mode would throw on a long-sum overflow
      val r = d.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    var sig = signature(e)
    var iter = 0
    var converged = e.isEmpty
    while (!converged && iter < maxIter) {
      val prev = e
      e = smallStar(largeStar(e)).localCheckpoint(true)
      // eager checkpoint: the previous round's edge blocks are dead —
      // release per round instead of accumulating until a driver GC
      graft.ops.Checkpoints.release(prev)
      val next = signature(e)
      converged = next == sig
      sig = next
      iter += 1
    }
    // fixed point is a forest of stars rooted at each component's min:
    // children point at the root; roots label themselves
    verts.join(e.select(col("u").as("v"), col("v").as("__root")), Seq("v"), "left")
      .select(col("v"), coalesce(col("__root"), col("v")).as("component"))
  }

  /** Best-member representative per cluster: production dedup keeps the
    * BEST copy of each duplicate group (longest, cleanest, highest
    * quality score), not the lowest id `assign` flags. One codegen'd
    * `min(struct(-priority, id))` hash aggregation per cluster (argmax
    * on priority, ties to the lowest id — deterministic).
    *
    * @param memberClusters (idCol, clusterCol) rows, one per member,
    *                       with whatever priority feeds `priority`
    * @return (clusterCol, n_members, keeper, keeper_priority)
    */
  def representativesBy(memberClusters: DataFrame, idCol: String,
                        clusterCol: String,
                        priority: org.apache.spark.sql.Column): DataFrame =
    memberClusters
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-priority).as("np"), col(idCol).as("id"))).as("__m"))
      .select(col(clusterCol), col("n_members"),
        col("__m.id").as("keeper"), (-col("__m.np")).as("keeper_priority"))
}
