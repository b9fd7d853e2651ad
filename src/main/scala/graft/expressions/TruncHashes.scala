package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, ShortType}

/** Elementwise LOW-BITS truncation of an `array<bigint>` — the scan-side
  * front of the two-tier near-dup verify ([[JaccardUpperBound]]): the
  * band exchange ships these 2-byte (bits=16) or 4-byte (bits=32)
  * elements instead of the full 8-byte gram hashes, cutting the fat
  * side's array bytes 4× (resp. 2×) while tier 1 still computes a
  * PROVABLE upper bound on the exact Jaccard from them.
  *
  * The output preserves element ORDER and MULTIPLICITY (length is
  * unchanged — that length is tier 1's |A| term, so it must equal the
  * original set size; the gram kernels emit distinct elements, making
  * length = true distinct count). Truncation is the plain low-bits cast
  * (`(short) h` / `(int) h`), a function of the element value — two
  * equal longs truncate equal, which is all the upper-bound proof needs.
  * Null array → null (unary null contract); a null ELEMENT survives as a
  * null element (cold boxed path — the gram kernels never emit one). */
case class TruncHashes(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 16 || bits == 32, s"trunc_hashes supports bits in {16, 32}, got $bits")

  override def dataType: DataType = {
    val elem = if (bits == 16) ShortType else IntegerType
    child.dataType match {
      case ArrayType(_, n) => ArrayType(elem, containsNull = n)
      case _ => ArrayType(elem)
    }
  }
  override def prettyName: String = "trunc_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    if (bits == 16) TruncHashes.trunc16(input.asInstanceOf[ArrayData])
    else TruncHashes.trunc32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (bits == 16) "trunc16" else "trunc32"
    defineCodeGen(ctx, ev, c => s"graft.expressions.TruncHashes.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TruncHashes =
    copy(child = newChild)
}

object TruncHashes {

  def trunc16(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return boxed(a, n, 16)
      out(i) = a.getLong(i).toShort
      i += 1
    }
    new GenericArrayData(out)
  }

  def trunc32(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return boxed(a, n, 32)
      out(i) = a.getLong(i).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Cold path for arrays carrying a null element. */
  private def boxed(a: ArrayData, n: Int, bits: Int): ArrayData = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else if (bits == 16) java.lang.Short.valueOf(a.getLong(i).toShort)
        else java.lang.Integer.valueOf(a.getLong(i).toInt)
      i += 1
    }
    new GenericArrayData(out)
  }

  def trunc_hashes(a: Column, bits: Int): Column =
    GraftExpressionBridge.toColumn(TruncHashes(GraftExpressionBridge.toExpression(a), bits))
}
