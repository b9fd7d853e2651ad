package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram keys of a document in one codegen'd pass — the
  * kernel form of `TextAnalysis.gramKeys` over
  * `transform(tokens(text), md5Int32)` (kept as the executable
  * specification; equality-tested in AnalysisSpec). Tokens are maximal
  * runs not in Java-regex `\s` (all-ASCII set, so the scan is UTF-8
  * byte-safe); each token hashes to its md5 hex prefix (first 4 digest
  * bytes, unsigned); each n-window combines polynomially with weights
  * 31^(n−1−j); keys dedupe in first-occurrence order. Docs shorter than
  * n collapse to one whole-doc fold `acc*31 + h` (seed 0 — a token-less
  * doc yields [0]), matching the oracle's `list_reduce` branch.
  *
  * The declarative form pays an interpreted HOF stage per zip_with in
  * the (n−1)-deep combine chain plus a UTF8String+hex-conv round trip
  * per token, twice (both ngramNovelty branches); the kernel is one byte
  * scan + one reused MD5 per evaluation.
  */
case class WordGramKeys(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def prettyName: String = "word_gram_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordGramKeys.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordGramKeys.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramKeys =
    copy(child = newChild)
}

object WordGramKeys {

  /** Per-thread digest (the SimHash48 pattern): getInstance per ROW pays
    * a JCA provider lookup + allocation on the hot scan. */
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Static kernel: distinct polynomial n-gram keys over per-token
    * md5Int32 hashes. */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    val md = digest.get()
    // per-token md5Int32 values
    val hs = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        hs += (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      }
    }
    val m = hs.length
    if (m < n) {
      // whole-doc fold (seed 0): [0] for a token-less doc
      var acc = 0L
      var j = 0
      while (j < m) { acc = acc * 31 + hs(j); j += 1 }
      return new GenericArrayData(Array(acc))
    }
    // EXACT wrapping powers of 31, built by integer multiplication:
    // math.pow goes through double and is inexact from 31^11 (> 2^53)
    // and saturates at 31^13 — the weighted sum below only equals the
    // wrapping fold `acc*31 + h` (the m < n branch above, and the
    // declarative spec/oracle form) when each weight is the exact
    // mod-2^64 power. Note the DECLARATIVE mirror (TextAnalysis
    // .gramKeys, and any ANSI SQL oracle) is only defined while
    // h·31^(n-1) fits in a long — under ANSI, Spark raises
    // ARITHMETIC_OVERFLOW from roughly n = 8 with 32-bit hashes — so
    // beyond that range THIS kernel's wrapping semantics are the
    // definition (AnalysisSpec pins n = 12 against an in-JVM fold).
    val weights = new Array[Long](n)
    weights(n - 1) = 1L
    var wj = n - 2
    while (wj >= 0) { weights(wj) = weights(wj + 1) * 31L; wj -= 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w0 = 0
    val lastW = m - n
    while (w0 <= lastW) {
      var key = 0L
      var j = 0
      while (j < n) { key += hs(w0 + j) * weights(j); j += 1 }
      seen.add(key)
      w0 += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def word_gram_keys(c: Column, n: Int): Column =
    GraftExpressionBridge.toColumn(WordGramKeys(GraftExpressionBridge.toExpression(c), n))
}
