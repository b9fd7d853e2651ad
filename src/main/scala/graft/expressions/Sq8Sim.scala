package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd asymmetric SQ8 similarity: the full-precision query
  * against a corpus vector reconstructed per dimension from its 8-bit
  * affine code against per-dimension [mn, mx] bounds —
  * `Σ_d q_d · (mn_d + round((x_d−mn_d)/(mx_d−mn_d)·255)·(mx_d−mn_d)/255)`.
  *
  * Replaces an interpreted `aggregate(sequence(...))` HOF whose
  * per-element CASE + decimal quantize/add chain dominated the SQ8 scan
  * (it ran outside whole-stage codegen and allocated ~n·q·d BigDecimals).
  * This kernel is a tight double loop fused into the surrounding stage.
  *
  * Determinism contract (cross-engine, partition-free): the fold is
  * WITHIN-row, dimensions ascending — exactly DuckDB's
  * `list_inner_product(q, recon_list)` where recon_list is built with
  * the same pinned-association arithmetic
  * (((x−mn)/(mx−mn))·255 rounded half-up, then (code·(mx−mn))/255).
  * Rounding: the scaled code is ≥ 0, and `frac = v − floor(v)` is exact
  * for v ≥ 0 (Sterbenz), so `frac ≥ 0.5 ? floor+1 : floor` reproduces
  * decimal HALF_UP / `std::round` on the double's exact value — no
  * `floor(v + 0.5)`, whose addition can carry v across the .5 boundary.
  *
  * Null contract: null array → null; any null element → null; a query
  * or bounds array SHORTER than the corpus vector → null (the HOF
  * predecessor's `element_at` past the end returned null and poisoned
  * the fold — never an out-of-bounds read).
  * Zero-span dimensions (mx == mn) reconstruct to mn exactly.
  */
case class Sq8Sim(first: Expression, second: Expression,
                  third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(t: DataType) = t match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    def boundsOk(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk(first.dataType) && vecOk(second.dataType) &&
      boundsOk(third.dataType) && boundsOk(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double> query, array<float|double> vec, " +
        s"array<double> mn, array<double> mx), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, ${third.dataType.catalogString}, " +
        s"${fourth.dataType.catalogString}")
  }

  private lazy val qFloat = VecKernels.isFloatArray(first.dataType)
  private lazy val vFloat = VecKernels.isFloatArray(second.dataType)

  override def nullSafeEval(q: Any, v: Any, mn: Any, mx: Any): Any =
    Sq8Sim.sim(q.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData],
      mn.asInstanceOf[ArrayData], mx.asInstanceOf[ArrayData], qFloat, vFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, v, mn, mx) => {
      val tmp = ctx.freshName("sq8Res")
      s"""
       |java.lang.Double $tmp = graft.expressions.Sq8Sim.sim($q, $v, $mn, $mx, $qFloat, $vFloat);
       |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): Sq8Sim =
    copy(first = f, second = s, third = t, fourth = o)
}

object Sq8Sim {
  /** Static kernel shared by interpreted and generated paths. Fold runs
    * over the CORPUS vector's length (the HOF predecessor sequenced on
    * size(vec) too). */
  def sim(q: ArrayData, v: ArrayData, mn: ArrayData, mx: ArrayData,
          qFloat: Boolean, vFloat: Boolean): java.lang.Double = {
    val n = v.numElements()
    // Bounds contract: the fold runs over the CORPUS vector's length, and
    // UnsafeArrayData getters have no runtime bounds checks — a shorter
    // query/bounds array must return null (the HOF null contract), not
    // read out of bounds.
    if (q.numElements() < n || mn.numElements() < n || mx.numElements() < n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || v.isNullAt(i) || mn.isNullAt(i) || mx.isNullAt(i)) return null
      val qd = if (qFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val lo = mn.getDouble(i)
      val hi = mx.getDouble(i)
      val recon =
        if (hi == lo) 0.0
        else {
          val scaled = ((x - lo) / (hi - lo)) * 255.0
          val fl = Math.floor(scaled)
          val code = if (scaled - fl >= 0.5) fl + 1.0 else fl
          (code * (hi - lo)) / 255.0
        }
      s += qd * (lo + recon)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column API: `sq8_sim(q, vec, mn, mx)`. */
  def sq8_sim(q: Column, vec: Column, mn: Column, mx: Column): Column =
    GraftExpressionBridge.toColumn(Sq8Sim(
      GraftExpressionBridge.toExpression(q), GraftExpressionBridge.toExpression(vec),
      GraftExpressionBridge.toExpression(mn), GraftExpressionBridge.toExpression(mx)))
}
