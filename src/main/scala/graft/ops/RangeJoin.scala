package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval rows
  * with start <= point < end, without a cartesian product.
  *
  * Catalyst turns a bare `pts.join(ivs, pt >= start && pt < end)` into a
  * BroadcastNestedLoopJoin (fine only while the interval side fits in a
  * broadcast) or, worse, a cartesian. The scale path is BUCKETING: slice
  * time into fixed-width buckets, explode each interval into the buckets
  * it overlaps, and equi-join on the bucket id before applying the exact
  * range predicate as a residual filter.
  *
  * Cost: one equi-join shuffle keyed by bucket. The interval side grows
  * by its average span / bucketWidth; pick bucketWidth near the median
  * interval length so the blow-up stays small while each point probes
  * exactly one bucket. This is the same plan Spark's own
  * session-window and Delta's OPTIMIZE ZORDER rely on, expressed with
  * public operators.
  */
object RangeJoin {

  /** Join `points` (epoch-seconds `pointCol`) to `intervals`
    * ([startCol, endCol) epoch-seconds, end exclusive) on containment,
    * inner. bucketWidthSec slices the timeline; both sides key on the
    * bucket index, then the exact predicate filters residuals. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidthSec: Long): DataFrame = {
    val b = lit(bucketWidthSec)
    // EMPTY/INVERTED intervals (end <= start) are filtered BEFORE the
    // explode: containment `point >= start && point < end` is
    // unsatisfiable for them, but Spark's two-arg sequence(start, stop)
    // defaults to step -1 when start > stop, so one corrupt interval
    // (end = 0 sentinel against an epoch-seconds start) would otherwise
    // explode into ~start/bucketWidth DESCENDING bucket rows — a
    // single-row OOM/straggler bomb the residual filter only cleans up
    // AFTER the blow-up. With the filter, sequence's stop >= start holds
    // (end exclusive: an interval ending on a bucket boundary does not
    // claim the next bucket).
    val ivExploded = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / b),
        floor((col(endCol) - 1) / b))))
    val ptBucketed = points.withColumn("__bucket", floor(col(pointCol) / b))
    ptBucketed.join(ivExploded, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
