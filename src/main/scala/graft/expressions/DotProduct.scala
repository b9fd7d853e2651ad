package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    * Sequential fold; null element → null, LENGTH MISMATCH → null (both
    * are HOF parity: `zip_with` pads the shorter side with nulls, so the
    * aggregate fold poisons to null — silently truncating to the shorter
    * length would instead mask a dimension-mismatch bug upstream as a
    * plausible score). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
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
  /** Null element or length mismatch → null (HOF parity — see
    * [[DotProduct.dot]]). */
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
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

/** Unit-L2-normalize a vector, same kernel design: at corpus scale you
  * normalize ONCE at the scan and every cosine downstream becomes a
  * plain dot product — q21's `cosine(a, b)` recomputes `norm(a)` and
  * `norm(b)` per candidate PAIR, an O(pairs × dim) tax this removes.
  * Zero vectors pass through unchanged (norm 0 would divide by zero);
  * null element → null array (HOF parity). */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // a null ELEMENT in a non-null array makes the result null, so this
  // must be nullable even over a non-nullable child (its siblings above
  // declare the same; omitting it lets Catalyst fold IsNotNull to true
  // and elide null checks in consuming projections)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${t.catalogString}")
  }

  private lazy val isFloat = VecKernels.isFloatArray(child.dataType)

  override def nullSafeEval(a: Any): Any =
    L2Normalize.normalize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("normRes")
      s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
       |  graft.expressions.L2Normalize.normalize($a, $isFloat);
       |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  /** Returns null on any null element; zero vector → copy of itself. */
  def normalize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    if (s > 0.0) {
      // divide (not multiply-by-reciprocal): x / sqrt(s) is what any SQL
      // engine's list_transform division computes — bit-parity matters
      val norm = math.sqrt(s)
      var j = 0
      while (j < n) { out(j) = out(j) / norm; j += 1 }
    }
    new GenericArrayData(out)
  }

  def l2_normalize(a: Column): Column =
    GraftExpressionBridge.toColumn(L2Normalize(GraftExpressionBridge.toExpression(a)))
}
