package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint in one codegen'd pass — the kernel
  * form of `TextAnalysis.fingerprint`'s declarative pipeline
  * (`aggregate(transform(tokens(text), md5Int32), 0,
  * (acc, h) -> pmod(acc*31 + h, 2^31-1))`). The HOF form runs
  * interpreted (per-token lambda dispatch + a UTF8String allocation per
  * token before each md5); this kernel scans the UTF-8 bytes once,
  * feeding each token's byte span straight into one reused MD5 instance.
  *
  * Value-identical to the HOF pipeline (equality-tested in
  * AnalysisSpec) and to the DuckDB oracle: tokens are maximal runs not
  * in Java-regex `\s` = [ \t\n\f\r] (all ASCII, so byte-level
  * scanning is UTF-8-safe); the per-token hash is the md5 hex prefix
  * (first 4 digest bytes, unsigned); the fold is mod 2^31−1 so
  * `acc*31 + h` never overflows a long.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def prettyName: String = "poly_fingerprint"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  private final val Mod = 2147483647L // 2^31 - 1

  /** Per-thread digest (the SimHash48 pattern): getInstance per ROW pays
    * a JCA provider lookup + allocation on the hot scan. */
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // Java-regex \s, byte-level (every member is ASCII)
  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Static kernel: fold (acc*31 + md5Int32(token)) mod 2^31−1 over the
    * whitespace tokens of `u`; 0 for a token-less string (the HOF fold's
    * seed). */
  def compute(u: UTF8String): Long = {
    val bytes = u.getBytes
    val n = bytes.length
    val md = digest.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        acc = (acc * 31 + h) % Mod
      }
    }
    acc
  }

  def poly_fingerprint(c: Column): Column =
    GraftExpressionBridge.toColumn(PolyFingerprint(GraftExpressionBridge.toExpression(c)))
}
