package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed ridge regression ("linear probe") via normal equations —
  * the one-pass way to train a linear quality classifier over a corpus
  * that does not fit anywhere: a d×d Gram matrix is a single map-side-
  * combined hash aggregation regardless of corpus size, and for small d
  * the solve is a closed-form expression, not an iterative job. This is
  * the standard shape for the regression-style quality scorers a
  * training-data pipeline fits over structural features (reference
  * analog: the per-document quality gates of SURVEY §2.6, upgraded from
  * fixed thresholds to a fitted model).
  *
  * d is fixed at 2 features + intercept so the solve is Cramer's rule
  * over a 3×3 system — and the WHOLE solve is a SQL expression built by
  * [[cramerExprs]], used verbatim by both the Spark plan (`selectExpr`)
  * and the DuckDB oracle. Both engines therefore execute the identical
  * IEEE-double expression tree over identical inputs:
  *
  *  - every Gram entry is a per-row double product quantized to
  *    DECIMAL(28,12) BEFORE summing (exact, associative, partition-order
  *    independent — the convention of q94/q100/q102), then cast to
  *    double once;
  *  - +, −, ×, / on doubles are correctly rounded by both engines, so
  *    a pinned parenthesization (every binary op is explicitly
  *    parenthesized in the generated SQL) gives bit-identical weights.
  *
  * Scale: the corpus is touched twice (Gram pass, scoring pass), both
  * embarrassingly parallel; the only non-scan state is the 1-row Gram /
  * weight table, which is broadcast. Nothing is collected to the driver.
  * For d beyond a handful, swap Cramer for a driver-side Cholesky over
  * the same Gram aggregate (the d² aggregate stays the scalable part;
  * the solve is O(d³) on nine-or-so doubles either way).
  *
  * The diagonal penalty is applied to ALL of A's diagonal including the
  * intercept cell — a deliberate simplification (documented, mirrored by
  * the oracle) that keeps the formula text identical on both engines.
  */
object RidgeProbe {

  private val Dec = "decimal(28,12)"

  /** One-row Gram aggregate over feature columns `x1`, `x2` and label
    * `y`: n, s1=Σx1, s2=Σx2, s11=Σx1², s12=Σx1x2, s22=Σx2², b0=Σy,
    * b1=Σx1y, b2=Σx2y — decimal-summed, emitted as doubles. */
  def gram(feats: DataFrame): DataFrame = {
    val x1 = col("x1"); val x2 = col("x2"); val y = col("y")
    feats.agg(
      count(lit(1)).as("n"),
      sum(x1.cast(Dec)).cast("double").as("s1"),
      sum(x2.cast(Dec)).cast("double").as("s2"),
      sum((x1 * x1).cast(Dec)).cast("double").as("s11"),
      sum((x1 * x2).cast(Dec)).cast("double").as("s12"),
      sum((x2 * x2).cast(Dec)).cast("double").as("s22"),
      sum(y.cast(Dec)).cast("double").as("b0"),
      sum((x1 * y).cast(Dec)).cast("double").as("b1"),
      sum((x2 * y).cast(Dec)).cast("double").as("b2"))
  }

  /** The DuckDB-side mirror of [[gram]] as a SELECT list (identical
    * quantize-then-sum semantics), for oracle CTEs. */
  val gramSelectSql: String =
    """count(*) AS n,
      CAST(sum(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
      CAST(sum(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
      CAST(sum(CAST((x1 * x1) AS DECIMAL(28,12))) AS DOUBLE) AS s11,
      CAST(sum(CAST((x1 * x2) AS DECIMAL(28,12))) AS DOUBLE) AS s12,
      CAST(sum(CAST((x2 * x2) AS DECIMAL(28,12))) AS DOUBLE) AS s22,
      CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS b0,
      CAST(sum(CAST((x1 * y) AS DECIMAL(28,12))) AS DOUBLE) AS b1,
      CAST(sum(CAST((x2 * y) AS DECIMAL(28,12))) AS DOUBLE) AS b2"""

  /** Cramer's-rule solve of (G + λI)w = b as three SQL expressions
    * `... AS w0/w1/w2` over the [[gram]] columns. `lambdaSql` must be a
    * double literal (e.g. "1.0"); every binary operation is explicitly
    * parenthesized so both engines build the identical IEEE tree. */
  def cramerExprs(lambdaSql: String): Seq[String] = {
    require(lambdaSql.matches("""\d+\.\d+"""),
      s"lambdaSql must be a plain double literal like \"1.0\" (it is spliced " +
        s"into SQL text on both engines), got: $lambdaSql")
    val L = lambdaSql
    // Minors reused across determinants (same text → same tree).
    val m11 = s"(((s11 + $L) * (s22 + $L)) - (s12 * s12))"
    val m12 = s"((s1 * (s22 + $L)) - (s12 * s2))"
    val m13 = s"((s1 * s12) - ((s11 + $L) * s2))"
    val c1 = s"((b1 * (s22 + $L)) - (s12 * b2))"
    val det = s"((((n + $L) * $m11) - (s1 * $m12)) + (s2 * $m13))"
    val det0 = s"(((b0 * $m11) - (s1 * $c1)) + (s2 * ((b1 * s12) - ((s11 + $L) * b2))))"
    val det1 = s"((((n + $L) * $c1) - (b0 * $m12)) + (s2 * ((s1 * b2) - (b1 * s2))))"
    val det2 = s"((((n + $L) * (((s11 + $L) * b2) - (s12 * b1))) - (s1 * ((s1 * b2) - (b1 * s2)))) + (b0 * $m13))"
    Seq(
      s"(($det0) / ($det)) AS w0",
      s"(($det1) / ($det)) AS w1",
      s"(($det2) / ($det)) AS w2")
  }

  /** Fit: 1-row DataFrame of (w0, w1, w2). Fully declarative — the Gram
    * aggregate and the solve are one plan, nothing is collected. */
  def fit(feats: DataFrame, lambdaSql: String = "1.0"): DataFrame =
    gram(feats).selectExpr(cramerExprs(lambdaSql): _*)

  /** Score `feats` with the fitted weights (broadcast 1-row join) and
    * append `pred` and `resid`. Prediction parenthesization is pinned:
    * (w0 + (w1 * x1)) + (w2 * x2). */
  def score(feats: DataFrame, lambdaSql: String = "1.0"): DataFrame =
    feats.crossJoin(broadcast(fit(feats, lambdaSql)))
      .withColumn("pred", expr("(w0 + (w1 * x1)) + (w2 * x2)"))
      .withColumn("resid", expr("y - ((w0 + (w1 * x1)) + (w2 * x2))"))
}
