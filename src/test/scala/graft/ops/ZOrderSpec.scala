package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("morton matches the reference bit-interleave for all 8x8 pairs") {
    val pairs = for { a <- 0L until 8L; b <- 0L until 8L } yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton(col("a"), col("b"), 3).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 3), s"($a,$b)") }
    // codes over the full grid are a permutation of 0..63
    assert(got.map(_._3).sorted.toSeq == (0L until 64L))
  }

  test("bucket maps range endpoints, stays in [0, 2^bits), and is monotone") {
    val bks = (0L to 99L).toDF("c")
      .select(col("c"), ZOrder.bucket(col("c"), lit(0L), lit(99L), 4).as("bk"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(bks.head._2 == 0L && bks.last._2 == 15L)
    assert(bks.sliding(2).forall(w => w(0)._2 <= w(1)._2))
    assert(bks.forall { case (_, bk) => bk >= 0 && bk < 16 })
  }

  test("consecutive morton chunks cover small rectangles in BOTH dims (the skipping property)") {
    // 16x16 grid, z-sorted, cut into 8 runs of 32 consecutive codes: every
    // run fits an 8x4 / 4x8 box — a row-major sort's runs span the full 16
    // in the minor dimension. This is exactly what per-file min/max stats
    // see after ZOrder.layout.
    val grid = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val chunks = grid.sortBy { case (x, y) => mortonRef(x, y, 4) }.grouped(32).toSeq
    assert(chunks.size == 8)
    chunks.foreach { c =>
      val sx = c.map(_._1).max - c.map(_._1).min
      val sy = c.map(_._2).max - c.map(_._2).min
      assert(sx <= 7 && sy <= 7, s"chunk spans ${sx + 1} x ${sy + 1}")
    }
    // row-major comparison: every 32-point run spans the whole y range
    val rowMajor = grid.sortBy { case (x, y) => x * 16 + y }.grouped(32).toSeq
    assert(rowMajor.forall(c => c.map(_._2).max - c.map(_._2).min == 15L))
  }

  test("layout produces non-overlapping, internally sorted z-ranges") {
    val grid = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val laid = ZOrder.layout(grid.toDF("x", "y"),
      ZOrder.morton(col("x"), col("y"), 4), numFiles = 8)
    val parts = laid
      .withColumn("z", ZOrder.morton(col("x"), col("y"), 4))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(parts.map(_._4).sum == 256L)
    // ranges ordered by partition id and pairwise disjoint
    parts.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
