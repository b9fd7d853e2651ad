package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram STRINGS of a document in one codegen'd pass —
  * the string-emitting sibling of [[WordGramKeys]], for consumers that
  * must REPORT the gram (boilerplate hotlists), not just key on it.
  *
  * Kernel form of `array_distinct(transform(sequence(0, size(ws)-n),
  * i => concat_ws(" ", element_at(ws, i+1) … element_at(ws, i+n))))`
  * over `ws = filter(split(trim(text), "\\s+"), _ != "")`. That
  * declarative chain sits under a Generate (no whole-stage codegen, no
  * subexpression elimination), so every `element_at(ws, …)` re-runs the
  * regex split of the FULL text — n re-tokenizations per gram, quadratic
  * per document (the same trap q115 hit; measured 60 s of a 60 s query
  * at sf0.1). Here: one whitespace byte-scan finds token boundaries,
  * each window copies its byte slice once (tokens joined by a single
  * space — byte-identical to concat_ws for `\s+`-split input), grams
  * dedupe in first-occurrence order. Docs with fewer than n tokens
  * yield an empty array (the `when(size >= n)` branch).
  *
  * Tokenization contract: Java-regex `\s` is the 6-char ASCII set, so
  * the byte scan is UTF-8 safe and matches both the declarative form
  * and the DuckDB oracle's `string_split_regex(trim(text), '\s+')`.
  */
case class WordGramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def prettyName: String = "word_gram_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordGramStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordGramStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramStrings =
    copy(child = newChild)
}

object WordGramStrings {

  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Static kernel: distinct space-joined word n-grams, first-occurrence
    * order; empty array when the doc has fewer than n tokens. */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // token boundaries: starts(i) inclusive, ends(i) exclusive — primitive
    // Int arrays with manual doubling (an ArrayBuffer[Int] boxes every
    // element, and this is the hottest loop of a per-document kernel)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s0 = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s0) {
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = s0; ends(m) = i; m += 1
      }
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w0 = 0
    val lastW = m - n
    while (w0 <= lastW) {
      var sz = n - 1 // the joining spaces
      var j = 0
      while (j < n) { sz += ends(w0 + j) - starts(w0 + j); j += 1 }
      val out = new Array[Byte](sz)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { out(p) = ' '.toByte; p += 1 }
        val tl = ends(w0 + j) - starts(w0 + j)
        System.arraycopy(bytes, starts(w0 + j), out, p, tl)
        p += tl
        j += 1
      }
      seen.add(UTF8String.fromBytes(out))
      w0 += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  def word_gram_strings(c: Column, n: Int): Column =
    GraftExpressionBridge.toColumn(WordGramStrings(GraftExpressionBridge.toExpression(c), n))
}
