package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed power-iteration PCA over an embedding column — the
  * "all-but-the-top" debiasing pass (Mu & Viswanath 2018): embedding
  * corpora concentrate mass in a few dominant directions; removing the
  * top component(s) before cosine search measurably improves retrieval
  * and semantic dedup. This is the linear-algebra-at-scale member of the
  * similarity family: SemDeDup/IVF consume its output.
  *
  * Shape: the corpus lives EXPLODED as (id, dim, centered-component)
  * rows. Each power-iteration round is two hash aggregations —
  *   s_i = Σ_d xc_{i,d}·v_d   (group by vector id, map-side combined)
  *   u_d = Σ_i xc_{i,d}·s_i   (group by dim — d rows cross the wire)
  * — and the driver holds only the d-vector between rounds (collect of
  * `dims` rows, re-broadcast as a 64-row dim table). No gram matrix, no
  * driver-side corpus, rounds × (2 aggregations) total.
  *
  * Determinism (and the DuckDB oracle): every cross-row sum is a
  * DECIMAL(38,12) sum of per-term doubles cast to DECIMAL(28,12) — exact
  * integer arithmetic, associative, so each round's v is bit-identical
  * under any partitioning and in any engine; the oracle UNROLLS the
  * fixed iteration count into generated CTEs ([[oracleSql]]) and matches
  * hash-for-hash. Per-term double products are IEEE-identical
  * everywhere; only the order-dependent summation needed the decimal
  * treatment ([[graft.analysis.UnigramLm]]'s trick, applied to linear
  * algebra).
  */
object Pca {

  private val DecTerm = "decimal(28,12)"

  /** Exploded, mean-centered corpus: (idCol, d, xc). Means are
    * decimal-summed per dim. Caller should checkpoint if iterating. */
  def centered(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // cast the exploded SCALAR, not the array: transform(cast) runs
    // interpreted and would knock the scan out of whole-stage codegen
    val x = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "xvf")))
      .select(col(idCol), col("d"), col("xvf").cast("double").as("xv"))
    val mu = x.groupBy("d").agg(
      (sum(col("xv").cast(DecTerm)).cast("double") / count(lit(1))).as("m"))
    x.join(broadcast(mu), "d")
      .select(col(idCol), col("d"), (col("xv") - col("m")).as("xc"))
  }

  /** Dominant principal component by `iters` fixed power-iteration
    * rounds from the uniform start 1/√dims. Sign-canonicalized: the
    * largest-|component| entry is non-negative (ties to the lowest
    * dim). */
  def principalComponent(xc: DataFrame, idCol: String, dims: Int,
                         iters: Int): Array[Double] = {
    val spark = xc.sparkSession
    import spark.implicits._
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 0 until iters) {
      val vdf = v.zipWithIndex.map { case (w, d) => (d, w) }.toSeq.toDF("d", "w")
      val s = xc.join(broadcast(vdf), "d")
        .groupBy(col(idCol))
        .agg(sum((col("xc") * col("w")).cast(DecTerm)).cast("double").as("s"))
      val u = xc.join(s, idCol)
        .groupBy("d")
        .agg(sum((col("xc") * col("s")).cast(DecTerm)).cast("double").as("u"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val uArr = Array.tabulate(dims)(d => u.getOrElse(d, 0.0))
      // norm² as the same decimal sum the oracle uses (HALF_UP per term)
      val n2 = uArr.map(x => new java.math.BigDecimal(x * x)
          .setScale(12, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val norm = math.sqrt(n2.doubleValue())
      if (norm > 0) v = uArr.map(_ / norm)
    }
    val lead = v.indices.maxBy(d => (math.abs(v(d)), -d))
    if (v(lead) < 0) v.map(-_) else v
  }

  /** Per-vector projection onto `v`: (idCol, proj). The debias residual
    * is x − proj·v; proj itself is the curation signal (extreme |proj| =
    * boilerplate direction). Decimal-summed like everything else. */
  def project(xc: DataFrame, idCol: String, v: Array[Double]): DataFrame = {
    val spark = xc.sparkSession
    import spark.implicits._
    val vdf = v.zipWithIndex.map { case (w, d) => (d, w) }.toSeq.toDF("d", "w")
    xc.join(broadcast(vdf), "d")
      .groupBy(col(idCol))
      .agg(sum((col("xc") * col("w")).cast(DecTerm)).cast("double").as("proj"))
  }

  /** The unrolled-iteration DuckDB mirror of
    * centered → principalComponent(iters) → project, emitting
    * (vec_id, proj rounded 4) over the embeddings table. Generated, not
    * hand-written: one CTE pair per round. */
  def oracleSql(dims: Int, iters: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and the
    // iteration chain references xc/v_i multiple times — un-hinted, the
    // expansion re-evaluates xc ~3^iters times (measured: 3 rounds
    // 0.67 s, 8 rounds minutes; materialized, 8 rounds 0.12 s).
    // The final `+ 0` normalizes IEEE negative zero: a projection in
    // (-5e-5, 0) rounds to -0.0 in DuckDB (sign-preserving) but 0.0 in
    // Spark (BigDecimal), and the hash compare is on strings.
    val sb = new StringBuilder
    sb ++= s"""WITH allv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      x AS MATERIALIZED (SELECT vec_id, unnest(range(0, len(v))) AS d, unnest(v) AS xv FROM allv),
      mu AS MATERIALIZED (SELECT d, CAST(sum(CAST(xv AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
             FROM x GROUP BY d),
      xc AS MATERIALIZED (SELECT vec_id, x.d, xv - m AS xc FROM x JOIN mu USING (d)),
      v0 AS MATERIALIZED (SELECT unnest(range(0, $dims)) AS d, 1.0 / sqrt($dims) AS w)"""
    for (i <- 0 until iters) {
      sb ++= s""",
      s$i AS MATERIALIZED (SELECT vec_id, CAST(sum(CAST(xc * w AS DECIMAL(28,12))) AS DOUBLE) AS s
              FROM xc JOIN v$i USING (d) GROUP BY vec_id),
      u$i AS MATERIALIZED (SELECT d, CAST(sum(CAST(xc * s AS DECIMAL(28,12))) AS DOUBLE) AS u
              FROM xc JOIN s$i USING (vec_id) GROUP BY d),
      n$i AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(38,12))) AS DOUBLE)) AS nn FROM u$i),
      v${i + 1} AS MATERIALIZED (SELECT d, u / nn AS w FROM u$i, n$i)"""
    }
    sb ++= s""",
      flip AS MATERIALIZED (SELECT CASE WHEN (SELECT w FROM v$iters ORDER BY abs(w) DESC, d ASC LIMIT 1) < 0
                           THEN -1.0 ELSE 1.0 END AS f),
      vf AS MATERIALIZED (SELECT d, w * f AS w FROM v$iters, flip)
      SELECT xc.vec_id, round(CAST(sum(CAST(xc * w AS DECIMAL(28,12))) AS DOUBLE), 4) + 0 AS proj
      FROM xc JOIN vf USING (d)
      GROUP BY xc.vec_id ORDER BY xc.vec_id"""
    sb.toString
  }
}
