package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd set-Jaccard over two `array<bigint>` columns —
  * value-identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (set semantics:
  * duplicate elements count once, a null element is one set member; null
  * ARRAY → null via the binary null contract). One deliberate divergence:
  * ∅ vs ∅ returns 1.0 (two empty sets are identical) where the
  * declarative division throws DIVIDE_BY_ZERO under ANSI — unobservable
  * in the hashed pipelines, whose gram kernels emit ≥ 1 element for any
  * input (the short-text fallback hashes the whole text), but a kernel
  * must not crash on a degenerate row.
  *
  * Why a kernel: the near-dup verify (MinHashLSH in-band and fetch forms)
  * evaluates this once per candidate band collision — 25.6M times at the
  * ×100 rehearsal — and `array_intersect`+`array_union` each build a
  * boxed hash set AND materialize a result array whose CONTENTS are
  * immediately discarded (only the sizes feed the division). This kernel
  * copies both arrays into per-thread scratch buffers, sorts them
  * (primitive dual-pivot), and counts distinct-common / distinct-total in
  * one merge — no boxing, no per-call allocation, fused into the
  * surrounding whole-stage-codegen'd join stage. |A∪B| is derived as
  * |A|+|B|−|A∩B| so one merge pays for both sizes.
  *
  * Reference semantics anchor: the text-similarity dedup gate
  * (`/root/reference/src/base.py:210-218`) keys on pairwise similarity of
  * kept vs incoming documents; Jaccard over shingle hash sets is this
  * library's scale-path equivalent (see MinHashLSH).
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.JaccardSim.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSim = copy(left = l, right = r)
}

object JaccardSim {

  /** Per-thread scratch (grown on demand, never shrunk): tasks are
    * single-threaded over an expression instance, so thread-local reuse
    * is safe and keeps the hot loop allocation-free. */
  private val scratchA = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }
  private val scratchB = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  private def fill(tl: ThreadLocal[Array[Long]], arr: ArrayData,
                   n: Int): (Array[Long], Int, Boolean) = {
    var buf = tl.get()
    if (buf.length < n) {
      var cap = buf.length
      while (cap < n) cap *= 2
      buf = new Array[Long](cap)
      tl.set(buf)
    }
    var c = 0
    var sawNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else { buf(c) = arr.getLong(i); c += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, c)
    (buf, c, sawNull)
  }

  /** Static kernel shared by interpreted and generated paths. Returns a
    * primitive double; empty∪empty → 1.0 per the class-level contract
    * (two empty sets are identical), spec'd in JaccardSimSpec. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val (sa, ca, aNull) = fill(scratchA, a, a.numElements())
    val (sb, cb, bNull) = fill(scratchB, b, b.numElements())
    var i = 0
    var j = 0
    var inter = 0L
    var da = 0L // distinct |A|
    var db = 0L // distinct |B|
    while (i < ca && j < cb) {
      val va = sa(i)
      val vb = sb(j)
      if (va == vb) {
        inter += 1; da += 1; db += 1
        i += 1; while (i < ca && sa(i) == va) i += 1
        j += 1; while (j < cb && sb(j) == vb) j += 1
      } else if (va < vb) {
        da += 1
        i += 1; while (i < ca && sa(i) == va) i += 1
      } else {
        db += 1
        j += 1; while (j < cb && sb(j) == vb) j += 1
      }
    }
    while (i < ca) { // distinct runs in A's tail
      val va = sa(i); da += 1
      i += 1; while (i < ca && sa(i) == va) i += 1
    }
    while (j < cb) {
      val vb = sb(j); db += 1
      j += 1; while (j < cb && sb(j) == vb) j += 1
    }
    if (aNull) da += 1
    if (bNull) { db += 1; if (aNull) inter += 1 }
    val union = da + db - inter
    if (union == 0L) 1.0 else inter.toDouble / union.toDouble
  }

  def jaccard_sim(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(JaccardSim(
      GraftExpressionBridge.toExpression(a), GraftExpressionBridge.toExpression(b)))
}
