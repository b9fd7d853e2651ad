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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (for IVF-style assignment). */
  def l2sq(a: Column, b: Column): Column =
    graft.expressions.L2Squared.l2_squared(a, b)

  /** Unit-L2 normalization: apply once at the scan, then `dot` alone is
    * cosine — removes the per-pair norm recomputation. */
  def normalize(a: Column): Column =
    graft.expressions.L2Normalize.l2_normalize(a)
}
