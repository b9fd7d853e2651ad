package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * hot kernel of every similarity operator (cosine top-k, LSH verify,
  * IVF assignment; reference analog N8/N9
  * `/root/reference/src/utils/tencent_api.py:111-136`).
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) => x*y), 0d,
  * (acc,v) => acc+v)` is a higher-order function: it runs OUTSIDE
  * whole-stage codegen, allocates a zipped intermediate array, and
  * evaluates boxed lambdas per element. This expression is a tight
  * primitive loop over the two ArrayData buffers, fused into the
  * surrounding codegen stage. Summation order is the same sequential
  * left-to-right fold, so results are bit-identical to the HOF form (and
  * to a DuckDB `list_inner_product`-style sequential sum).
  *
  * Null contract: null array → null (BinaryExpression default); any null
  * ELEMENT → null, matching the HOF's null propagation.
  *
  * Accepts `array<float>` or `array<double>` on either side; floats are
  * widened per element (exact in ieee754 — identical values to a
  * `transform(cast)` pass, WITHOUT the interpreted-HOF cast stage that
  * would knock the surrounding projection out of whole-stage codegen).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkVecTypes(prettyName, left.dataType, right.dataType)

  private lazy val aFloat = VecKernels.isFloatArray(left.dataType)
  private lazy val bFloat = VecKernels.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
       |java.lang.Double $tmp = graft.expressions.DotProduct.dot($a, $b, $aFloat, $bFloat);
       |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Shared type plumbing for the vector kernels. */
object VecKernels {
  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVecTypes(name: String, l: DataType, r: DataType): TypeCheckResult = (l, r) match {
    case (ArrayType(DoubleType | FloatType, _), ArrayType(DoubleType | FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<float|double> arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }
}

object DotProduct {
  /** Static kernel shared by interpreted and generated code paths.
    * Sequential fold; null element → null (HOF parity). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column API: `dot_product($"a", $"b")`. */
  def dot_product(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(DotProduct(
      GraftExpressionBridge.toExpression(a), GraftExpressionBridge.toExpression(b)))
}

/** Squared L2 distance, same design as [[DotProduct]] (sequential fold →
  * bit-identical to the `aggregate(zip_with(...))` HOF form it replaces). */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_squared"

  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkVecTypes(prettyName, left.dataType, right.dataType)

  private lazy val aFloat = VecKernels.isFloatArray(left.dataType)
  private lazy val bFloat = VecKernels.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    L2Squared.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2Res")
      s"""
       |java.lang.Double $tmp = graft.expressions.L2Squared.l2sq($a, $b, $aFloat, $bFloat);
       |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def l2_squared(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(L2Squared(
      GraftExpressionBridge.toExpression(a), GraftExpressionBridge.toExpression(b)))
}
