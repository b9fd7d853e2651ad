package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a pre-hashed shingle set, computed per row in one
  * tight pass — `sig[j] = min_h (a_j·h + b_j) mod P` over the affine
  * family. Replaces the explode + numHashes-`min`-aggregations plan
  * (which shuffles one row per shingle into an aggregation): the
  * signature becomes SCAN-SIDE work with no exchange at all, and band
  * keys derive from the array column directly. ~2000 shingles × 64
  * hashes ≈ 128k multiply-mods per document — microseconds in JVM code,
  * where the exploded form pays row overhead per shingle.
  *
  * Coefficients are the deterministic seeded family shared with
  * `MinHashLSH` (single source of truth in this companion), so the
  * signatures are identical to the aggregation path's.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Large Mersenne prime for the affine hash family. */
  val P: Long = 2147483647L

  /** Deterministic (a, b) coefficients for h_i(x) = (a_i·x + b_i) mod P
    * — THE family (MinHashLSH delegates here). */
  def coeffs(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def table(n: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(n, _ => {
      val cs = coeffs(n)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** Static kernel shared by interpreted and generated paths. Null
    * elements are not expected (NgramHashes emits none) and are skipped. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val (as, bs) = table(numHashes)
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = arr.getLong(i)
        val h = ((h0 % P) + P) % P // pmod: base hash into [0, P)
        var j = 0
        while (j < numHashes) {
          val v = (as(j) * h + bs(j)) % P // a<P, h<P → product < 2^62, no overflow
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash_sig(c: Column, numHashes: Int): Column =
    GraftExpressionBridge.toColumn(MinHashSig(GraftExpressionBridge.toExpression(c), numHashes))
}
