package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, ShortType}

/** PROVABLE upper bound on the exact set Jaccard, computed from
  * [[TruncHashes]]-truncated arrays — tier 1 of the two-tier near-dup
  * verify. Contract: for DISTINCT-element long arrays A and B (what the
  * gram kernels emit),
  *
  *   jaccard_upper(trunc(A), trunc(B))  >=  jaccard_sim(A, B)
  *
  * so filtering band collisions at `jaccard_upper >= t` passes a strict
  * SUPERSET of the pairs the exact verify keeps: tier 2 re-verifies the
  * (pair-bounded) survivors with the full arrays and the output is
  * identical to a single-tier exact verify by construction. Truncation
  * collisions only cost tier-1 SELECTIVITY (a few extra survivors),
  * never correctness.
  *
  * Why it's an upper bound (and why naive Jaccard of truncated sets is
  * NOT): truncation f can merge two exact-intersection elements into
  * one, DEFLATING a plain distinct-set Jaccard below the true value
  * (i−1)/(u−1) < i/u. This kernel instead computes
  *
  *   i_up = Σ_w min(countA(w), countB(w))   (multiset-min intersection)
  *   J_up = i_up / (|A| + |B| − i_up)
  *
  * where |A|, |B| are the PHYSICAL lengths (= true distinct set sizes —
  * TruncHashes preserves length exactly for this reason). Every exact
  * common element contributes one copy of its truncated value to BOTH
  * multisets, so c_w (common elements mapping to w) ≤ min(countA(w),
  * countB(w)) and i_exact = Σ c_w ≤ i_up; J(i) = i/(na+nb−i) is
  * monotonic in i, hence J_up ≥ J_exact. Spurious cross-collisions only
  * push the bound HIGHER. (JaccardUpperBoundSpec property-checks the
  * bound against jaccard_sim on random distinct sets.)
  *
  * Same mechanics as [[JaccardSim]]: per-thread scratch, primitive sort,
  * one merge — multiset counting is the SIMPLER merge (no distinct-run
  * skipping). Null elements count as one member per side and intersect
  * pairwise (min of the two null counts); null array → null; both
  * empty → 1.0 (two empty sets are identical, the JaccardSim contract).
  */
case class JaccardUpperBound(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_upper"

  private lazy val isShort = left.dataType match {
    case ArrayType(ShortType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType) = t match {
      case ArrayType(e @ (ShortType | IntegerType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<smallint> or two array<int> arguments, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isShort)
      JaccardUpperBound.upper16(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      JaccardUpperBound.upper32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isShort) "upper16" else "upper32"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.JaccardUpperBound.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardUpperBound = copy(left = l, right = r)
}

object JaccardUpperBound {

  private val shortA = new ThreadLocal[Array[Short]] {
    override def initialValue(): Array[Short] = new Array[Short](256)
  }
  private val shortB = new ThreadLocal[Array[Short]] {
    override def initialValue(): Array[Short] = new Array[Short](256)
  }
  private val intA = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val intB = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  def upper16(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (sa, ca) = fill16(shortA, a, na)
    val (sb, cb) = fill16(shortB, b, nb)
    var i = 0; var j = 0
    // multiset-min merge: one matched copy per step, no run skipping
    var inter = (na - ca).min(nb - cb).toLong // paired null members
    while (i < ca && j < cb) {
      val va = sa(i); val vb = sb(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    finish(inter, na, nb)
  }

  def upper32(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (sa, ca) = fill32(intA, a, na)
    val (sb, cb) = fill32(intB, b, nb)
    var i = 0; var j = 0
    var inter = (na - ca).min(nb - cb).toLong
    while (i < ca && j < cb) {
      val va = sa(i); val vb = sb(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    finish(inter, na, nb)
  }

  private def finish(inter: Long, na: Int, nb: Int): Double = {
    val union = na.toLong + nb.toLong - inter
    if (union == 0L) 1.0 else inter.toDouble / union.toDouble
  }

  private def fill16(tl: ThreadLocal[Array[Short]], arr: ArrayData,
                     n: Int): (Array[Short], Int) = {
    var buf = tl.get()
    if (buf.length < n) {
      var cap = buf.length
      while (cap < n) cap *= 2
      buf = new Array[Short](cap); tl.set(buf)
    }
    var c = 0; var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { buf(c) = arr.getShort(i); c += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, c)
    (buf, c)
  }

  private def fill32(tl: ThreadLocal[Array[Int]], arr: ArrayData,
                     n: Int): (Array[Int], Int) = {
    var buf = tl.get()
    if (buf.length < n) {
      var cap = buf.length
      while (cap < n) cap *= 2
      buf = new Array[Int](cap); tl.set(buf)
    }
    var c = 0; var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { buf(c) = arr.getInt(i); c += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, c)
    (buf, c)
  }

  def jaccard_upper(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(JaccardUpperBound(
      GraftExpressionBridge.toExpression(a), GraftExpressionBridge.toExpression(b)))
}
