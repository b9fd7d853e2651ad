package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-weighted budget apportionment: split an integer document
  * budget across sources proportionally to `count^α` (temperature
  * sampling — upweights small sources so a dominant crawl doesn't drown
  * them), with EXACT integer totals via largest-remainder (Hamilton)
  * rounding: floor every quota, then hand the leftover units to the
  * largest fractional parts. The mixture-recipe step between q68's
  * draw-level mixture and q118's per-source caps.
  *
  * Determinism: α is fixed at 0.5 — `sqrt` is IEEE-correctly-rounded on
  * every engine, unlike `pow`/`ln` chains whose last-ulp behavior is
  * libm-specific (for general α, quantize `exp(α·ln n)` to DECIMAL and
  * accept the documented ulp risk). Each weight is decimal-quantized
  * before the total, shares divide as doubles (identical inputs →
  * identical IEEE result), and the remainder ranking breaks ties by
  * key. Output is all integers.
  *
  * Scale: the heavy part is the per-source count (map-side combined);
  * everything after runs on source-cardinality rows — the ranking
  * window is over |sources|, not documents.
  */
object Apportion {

  def bySqrtCount(counts: DataFrame, keyCol: String, nCol: String,
      budget: Long): DataFrame = {
    val w = counts
      .withColumn("__w", sqrt(col(nCol)).cast("decimal(28,12)"))
    val tot = w.agg(sum("__w").as("__tw"))
    val quota = w.crossJoin(broadcast(tot))
      .withColumn("quota",
        col("__w").cast("double") / col("__tw").cast("double") * budget)
      .withColumn("base", floor(col("quota")).cast("long"))
      .withColumn("frac", col("quota") - col("base"))
    val rk = Window.orderBy(col("frac").desc, col(keyCol).asc)
    val leftW = Window.partitionBy(lit(1))
    quota
      .withColumn("__left", lit(budget) - sum("base").over(leftW))
      .withColumn("__rk", row_number().over(rk))
      .select(col(keyCol), col(nCol),
        (col("base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("target"))
  }
}
