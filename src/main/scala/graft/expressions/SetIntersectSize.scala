package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd `size(array_intersect(a, b))` for `array<bigint>` and
  * `array<string>` — the counting sibling of [[JaccardSim]], for verifies
  * that carry their own set sizes and need only |A∩B| (the PPJoin exact
  * verify computes J = i/(na+nb−i) from pre-aggregated sizes, so the
  * ratio kernel doesn't fit). Same set semantics as the declarative form:
  * duplicates count once, a null element is one set member and intersects
  * iff present on both sides, null ARRAY → null.
  *
  * Same rationale as JaccardSim: `array_intersect` builds a boxed hash
  * set and materializes a result array per call whose contents are
  * discarded by the enclosing `size`. Here both arrays copy into
  * per-thread scratch, sort (primitive for longs, binary UTF8String
  * compare for strings), and one merge counts distinct-common. */
case class SetIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_intersect_size"

  private lazy val isString = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType) = t match {
      case ArrayType(e @ (LongType | StringType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> or two array<string> arguments, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      SetIntersectSize.interString(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SetIntersectSize.interLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "interString" else "interLong"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.SetIntersectSize.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SetIntersectSize = copy(left = l, right = r)
}

object SetIntersectSize {

  private val longA = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }
  private val longB = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }
  private val refA = new ThreadLocal[Array[UTF8String]] {
    override def initialValue(): Array[UTF8String] = new Array[UTF8String](256)
  }
  private val refB = new ThreadLocal[Array[UTF8String]] {
    override def initialValue(): Array[UTF8String] = new Array[UTF8String](256)
  }

  def interLong(a: ArrayData, b: ArrayData): Int = {
    val (sa, ca, aNull) = fillLong(longA, a)
    val (sb, cb, bNull) = fillLong(longB, b)
    var i = 0; var j = 0; var inter = 0
    while (i < ca && j < cb) {
      val va = sa(i); val vb = sb(j)
      if (va == vb) {
        inter += 1
        i += 1; while (i < ca && sa(i) == va) i += 1
        j += 1; while (j < cb && sb(j) == vb) j += 1
      } else if (va < vb) { i += 1; while (i < ca && sa(i) == va) i += 1 }
      else { j += 1; while (j < cb && sb(j) == vb) j += 1 }
    }
    if (aNull && bNull) inter + 1 else inter
  }

  private def fillLong(tl: ThreadLocal[Array[Long]],
                       arr: ArrayData): (Array[Long], Int, Boolean) = {
    val n = arr.numElements()
    var buf = tl.get()
    if (buf.length < n) {
      var cap = buf.length
      while (cap < n) cap *= 2
      buf = new Array[Long](cap); tl.set(buf)
    }
    var c = 0; var sawNull = false; var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else { buf(c) = arr.getLong(i); c += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, c)
    (buf, c, sawNull)
  }

  def interString(a: ArrayData, b: ArrayData): Int = {
    val (sa, ca, aNull) = fillRef(refA, a)
    val (sb, cb, bNull) = fillRef(refB, b)
    var i = 0; var j = 0; var inter = 0
    while (i < ca && j < cb) {
      val va = sa(i); val vb = sb(j)
      val cmp = va.compareTo(vb)
      if (cmp == 0) {
        inter += 1
        i += 1; while (i < ca && sa(i).equals(va)) i += 1
        j += 1; while (j < cb && sb(j).equals(vb)) j += 1
      } else if (cmp < 0) { i += 1; while (i < ca && sa(i).equals(va)) i += 1 }
      else { j += 1; while (j < cb && sb(j).equals(vb)) j += 1 }
    }
    if (aNull && bNull) inter + 1 else inter
  }

  private def fillRef(tl: ThreadLocal[Array[UTF8String]],
                      arr: ArrayData): (Array[UTF8String], Int, Boolean) = {
    val n = arr.numElements()
    var buf = tl.get()
    if (buf.length < n) {
      var cap = buf.length
      while (cap < n) cap *= 2
      buf = new Array[UTF8String](cap); tl.set(buf)
    }
    var c = 0; var sawNull = false; var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else { buf(c) = arr.getUTF8String(i); c += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf.asInstanceOf[Array[AnyRef]], 0, c,
      null.asInstanceOf[java.util.Comparator[AnyRef]])
    (buf, c, sawNull)
  }

  def set_intersect_size(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(SetIntersectSize(
      GraftExpressionBridge.toExpression(a), GraftExpressionBridge.toExpression(b)))
}
