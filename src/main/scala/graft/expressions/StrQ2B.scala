package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for full-width → half-width CJK
  * normalization (SURVEY.md O3, `/root/reference/src/lurkers/etnet.py:129-142`):
  * U+3000 (ideographic space) → U+0020; U+FF01..U+FF5E shifted down by
  * 0xFEE0 onto their ASCII counterparts.
  *
  * A codepoint map has no built-in equivalent (`translate` would need a
  * 95-char mapping table on every call site), and a Scala UDF forces
  * ser/de through the encoder boundary and blocks whole-stage codegen.
  * This expression participates in codegen via `defineCodeGen` — the
  * generated code calls the static converter directly on the row's
  * UTF8String, keeping the surrounding stage fused. Null-safe (null in →
  * null out) like all UnaryExpressions.
  */
case class StrQ2B(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "str_q2b"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    StrQ2B.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StrQ2B.convert($c)")

  override protected def withNewChildInternal(newChild: Expression): StrQ2B =
    copy(child = newChild)
}

object StrQ2B {
  /** Static converter shared by interpreted and generated code paths. */
  def convert(u: UTF8String): UTF8String = {
    val s = u.toString
    var i = 0
    var changed = false
    while (i < s.length && !changed) {
      val ch = s.charAt(i)
      changed = ch == '　' || (ch >= 0xFF01 && ch <= 0xFF5E)
      i += 1
    }
    if (!changed) u // fast path: no full-width chars, no allocation
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        val ch = s.charAt(j)
        sb.append(
          if (ch == '　') ' '
          else if (ch >= 0xFF01 && ch <= 0xFF5E) (ch - 0xFEE0).toChar
          else ch)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Column API: `str_q2b($"text")`. */
  def str_q2b(c: Column): Column =
    GraftExpressionBridge.toColumn(StrQ2B(GraftExpressionBridge.toExpression(c)))
}
