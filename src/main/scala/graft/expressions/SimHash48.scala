package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SimHash over a token array — one scan-side kernel call
  * replacing the explode + `bits` signed-vote-sum aggregation plan
  * (`SimHash.simhashDF`'s shuffle disappears entirely).
  *
  * BIT-EXACT with the SQL/DuckDB formulation the oracle verifies:
  * token hash = first 12 md5 hex chars as a number ≡ the md5 digest's
  * first 6 bytes big-endian; bit j of the signature is set iff the
  * majority (sum of ±1 votes) over tokens of hash-bit j is positive.
  * Multiplicity-weighted, like the aggregated form.
  */
case class SimHash48(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 48, "hash prefix provides at most 48 bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash48.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 bytes big-endian == first 12 md5 hex chars as a number
    * (the cross-engine token hash `SimHash.tokenHash48` computes in SQL). */
  def tokenHash48(t: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(t.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  def compute(toks: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = tokenHash48(toks.getUTF8String(i))
        var j = 0
        while (j < bits) {
          votes(j) += (((h >> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  def simhash48(c: Column, bits: Int = 48): Column =
    GraftExpressionBridge.toColumn(SimHash48(GraftExpressionBridge.toExpression(c), bits))
}
