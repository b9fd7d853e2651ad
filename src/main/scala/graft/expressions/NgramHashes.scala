package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of a string's k-shingles, computed in one tight
  * codegen'd pass — the scan-side front of MinHash-LSH near-dup detection
  * (north-star corpus dedup; reference similarity analog
  * `/root/reference/src/utils/tencent_api.py:111-123`).
  *
  * Materializing shingles as STRING ARRAYS (`transform(sequence(...))` /
  * zip_with chains) costs: an interpreted HOF stage per consumer, one
  * UTF8String allocation per shingle, and — when signatures are computed
  * by explode + hash — a per-row hash of each materialized string. At
  * ~2k char-8-grams per 2 KB document that dominates the whole near-dup
  * pipeline. Hashing the shingles inline collapses all of it to one
  * char loop per document; downstream (MinHash signatures, banding,
  * exact-Jaccard verify) operates on `array<bigint>` — identical Jaccard
  * modulo 64-bit collisions (~n²/2⁶⁴ per pair, negligible), and the
  * verify join moves 8-byte hashes instead of shingle text.
  *
  * Hash: FNV-1a over UTF-16 code units (deterministic, allocation-free).
  * Semantics match the string pipeline: k-CHAR (not byte) windows;
  * shorter-than-k input hashes as a single whole-string shingle.
  */
abstract class NgramHashesBase extends UnaryExpression {
  def k: Int
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
}

/** Distinct hashes of all k-char substrings (char-shingle variant;
  * `TextOps.charShingles` is the string-materializing equivalent). */
case class CharNgramHashes(child: Expression, k: Int) extends NgramHashesBase {
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashes.charGrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NgramHashes.charGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** Distinct hashes of all k-word shingles (whitespace tokenization,
  * single space as joiner — `TextOps.wordShingles` equivalent; fewer
  * than k tokens hashes the space-joined whole). */
case class WordNgramHashes(child: Expression, k: Int) extends NgramHashesBase {
  override def prettyName: String = "word_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashes.wordGrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NgramHashes.wordGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a of a whole string — the hash the kernels assign to a single
    * shingle; exposed so literal lookup sets (e.g. language-profile
    * trigrams) can be matched against kernel output. */
  def fnv1aOf(s: String): Long = fnv1a(s, 0, s.length)

  private def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h = (h ^ s.charAt(i)) * FnvPrime
      i += 1
    }
    h
  }

  /** Static kernel: distinct FNV-1a hashes of k-char windows. */
  def charGrams(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    if (s.length < k) return new GenericArrayData(Array(fnv1a(s, 0, s.length)))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    val last = s.length - k
    while (i <= last) {
      seen.add(fnv1a(s, i, i + k))
      i += 1
    }
    toArrayData(seen)
  }

  /** Static kernel: distinct FNV-1a hashes of k-word windows. Tokens are
    * maximal non-whitespace runs; windows hash as "w1 w2 ... wk" (the
    * single-space joiner hashes as ' ' between token spans). */
  def wordGrams(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    // token spans [start, end)
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < s.length) {
      if (!Character.isWhitespace(s.charAt(i))) {
        starts += i
        while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
        ends += i
      } else i += 1
    }
    val n = starts.length
    def gramHash(w0: Int, nWords: Int): Long = {
      var h = FnvOffset
      var w = w0
      val stop = w0 + nWords
      while (w < stop) {
        var j = starts(w)
        val e = ends(w)
        while (j < e) { h = (h ^ s.charAt(j)) * FnvPrime; j += 1 }
        if (w < stop - 1) h = (h ^ ' ') * FnvPrime
        w += 1
      }
      h
    }
    if (n < k) return new GenericArrayData(Array(gramHash(0, n)))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w0 = 0
    val lastW = n - k
    while (w0 <= lastW) {
      seen.add(gramHash(w0, k))
      w0 += 1
    }
    toArrayData(seen)
  }

  private def toArrayData(seen: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def char_ngram_hashes(c: Column, k: Int): Column =
    GraftExpressionBridge.toColumn(CharNgramHashes(GraftExpressionBridge.toExpression(c), k))

  def word_ngram_hashes(c: Column, k: Int): Column =
    GraftExpressionBridge.toColumn(WordNgramHashes(GraftExpressionBridge.toExpression(c), k))
}
