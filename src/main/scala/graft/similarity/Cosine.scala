package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, backed by the
  * native codegen'd kernels in `graft.expressions` (no UDF, no MLlib
  * dependency). Computation is in double: cast once with `toDouble`, then
  * the kernels run tight primitive loops fused into the surrounding
  * whole-stage codegen. (The earlier `aggregate(zip_with(...))`
  * higher-order-function forms produced identical values — sequential
  * fold — but ran interpreted, dominating every similarity query's
  * profile; the kernels are drop-in bit-identical.)
  *
  * Reference analog: the text-similarity / sentence-embedding API surface
  * (`/root/reference/src/utils/tencent_api.py:111-136`, N8/N9) — re-expressed
  * as columnar operators a 100 TB pipeline can run scan-side.
  */
object Cosine {

  /** Cast an array<float> to array<double> (do this once per scan). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with a ZERO-NORM guard: a zero vector (which
    * `hashEmbeddingDF` legitimately emits for token-less docs) has no
    * direction, and the raw 0/0 would be NaN — which Spark orders and
    * compares as LARGER than every number, so one zero vector in a
    * dedup cell would "near-duplicate" everything (`sim >= tau` is true
    * for NaN) and rank first in every sim-desc top-k. Zero-norm pairs
    * score 0.0 instead: similar to nothing, ranked last. */
  def cosine(a: Column, b: Column): Column = {
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(dot(a, b) / nn)
  }

  /** Squared L2 distance (for IVF-style assignment). */
  def l2sq(a: Column, b: Column): Column =
    graft.expressions.L2Squared.l2_squared(a, b)

  /** Unit-L2 normalization: apply once at the scan, then `dot` alone is
    * cosine — removes the per-pair norm recomputation. */
  def normalize(a: Column): Column =
    graft.expressions.L2Normalize.l2_normalize(a)
}
