package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * A parquet scan prunes row groups by per-file min/max stats, which only
  * help for the column the data is sorted on. Sorting by the interleaved
  * Morton code of two (bucketized) dimensions gives every file a small
  * bounding RECTANGLE, so predicates on EITHER dimension prune — the
  * layout trick behind Delta/Iceberg `ZORDER BY`, expressed here as plain
  * codegen'd bit arithmetic + `repartitionByRange` (a range exchange on
  * the code, i.e. exactly one shuffle to lay out any amount of data).
  *
  * Everything is integer math, so an oracle can reproduce codes exactly.
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of two non-negative
    * longs (`a` even positions, `b` odd). Pure shifts/masks — stays in
    * whole-stage codegen. */
  def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Proportional bucket of `c` into [0, 2^bits) over the closed range
    * [minV, maxV]. Computed as a double divide + trunc-cast, which equals
    * floor division (and thus agrees bit-for-bit with an integer-SQL
    * oracle) ONLY while both `(c - minV) * 2^bits` and
    * `(maxV - minV + 1)` stay below 2^53, where every intermediate is
    * exactly representable in double — callers bucketing wider-than-2^53
    * domains must pre-scale the column. */
  def bucket(c: Column, minV: Column, maxV: Column, bits: Int): Column = {
    require(bits > 0 && bits < 53, s"bits=$bits outside the double-exact range")
    val n = lit(1L << bits)
    (((c - minV) * n) / (maxV - minV + lit(1L))).cast("long")
  }

  /** Physically lay out `df` along the Morton curve of two bucketized
    * dimension columns: one range exchange + an in-partition sort, ready
    * to write. `numFiles` bounds output file count. */
  def layout(df: DataFrame, code: Column, numFiles: Int): DataFrame = {
    val coded = df.withColumn("__z", code)
    coded.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
