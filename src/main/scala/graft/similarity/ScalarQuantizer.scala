package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** SQ8 scalar quantization for embedding columns: each dimension is
  * affinely mapped to an 8-bit code against per-dimension corpus
  * [min, max] bounds — 4× less scan I/O than float32 vectors, the
  * third standard ANN compression tier next to `IvfFlat` (coarse cells)
  * and `ProductQuantizer` (subspace codebooks). Asymmetric distance
  * keeps the query side in full precision and reconstructs the corpus
  * side per dimension (`recon = mn + code·span/255`), the same
  * query-exact/corpus-compressed split as PQ's ADC.
  *
  * Determinism contract (the q93/q104 pattern): every per-dimension
  * contribution `q_d · recon_d` is an IEEE double expression evaluated
  * identically on any engine, then quantized to DECIMAL(28,12) BEFORE
  * the sum, so the score is partition-order- and fold-order-independent
  * and DuckDB reproduces it bit-for-bit.
  *
  * Scale: `fit` is one map-side-combined agg over 64 keys (partials make
  * the tiny key domain a non-issue); the score pass broadcasts the
  * 1-row params and the query set, computes the fold entirely row-local
  * (the corpus is never exploded — a per-(vec,dim) join would put n·d
  * rows through the exchange), and ends in the salted two-phase top-k.
  * Constant-size-dominated; one shuffle total (the top-k's).
  */
object ScalarQuantizer {

  /** Per-dimension corpus bounds, pivoted to one row of index-aligned
    * arrays (`mn`, `mx`) for broadcast. */
  def fitParams(corpus: DataFrame, vecCol: String): DataFrame =
    corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("s"))
      .select(
        transform(col("s"), e => e.getField("mn")).as("mn"),
        transform(col("s"), e => e.getField("mx")).as("mx"))

  /** Decimal-summed asymmetric similarity of a full-precision query
    * vector against a reconstructed SQ8 corpus vector. Columns `qvec`,
    * `vec`, `mn`, `mx` must be in scope; zero-span dimensions
    * reconstruct to `mn` exactly. */
  /** Decimal widths are load-bearing: contribution DECIMAL(16,12) +
    * accumulator DECIMAL(25,12) add to (26,12) — the SCALE survives, so
    * casting back to (25,12) is a range check, never a rounding (a
    * (38,12) accumulator would widen the add to (38,11) and silently
    * round the 12th decimal away from DuckDB's exact scale-12 sum). */
  private val simExpr =
    """aggregate(
         sequence(1, size(vec)),
         CAST(0 AS DECIMAL(25,12)),
         (acc, i) -> CAST(acc + CAST(
           CAST(element_at(qvec, i) AS DOUBLE) * (
             element_at(mn, i) + CASE
               WHEN element_at(mx, i) = element_at(mn, i) THEN CAST(0.0 AS DOUBLE)
               ELSE round((CAST(element_at(vec, i) AS DOUBLE) - element_at(mn, i))
                      / (element_at(mx, i) - element_at(mn, i)) * 255.0)
                    * (element_at(mx, i) - element_at(mn, i)) / 255.0
             END) AS DECIMAL(16,12)) AS DECIMAL(25,12)))"""

  /** Top-k per query by asymmetric SQ8 similarity. `queries` must be
    * broadcast-small (it is crossed against the whole corpus). */
  def topKAsymmetric(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val params = fitParams(corpus, "vec")
    val scored = corpus
      .crossJoin(broadcast(params))
      .crossJoin(broadcast(queries))
      .withColumn("simd", expr(simExpr))
    TopK.perGroup(scored, Seq("query_id"),
        Seq(col("simd").desc, col("vec_id").asc), k,
        saltOn = hash(col("vec_id")), rankCol = "rank")
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("simd").cast("double"), 6).as("sim"))
  }
}
