package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase running sum equals the sequential fold, any partitioning") {
    val rnd = new scala.util.Random(3)
    // bucket = id/40: coarse, monotone in the order key
    val rows = (0 until 400).map(i => (i.toLong, (i / 40).toLong, rnd.nextDouble() * 10))
    // mirror the op: exact decimal accumulation, ONE double cast at the end
    val want = rows.sortBy(_._1).scanLeft(BigDecimal(0)) { case (acc, (_, _, v)) =>
      acc + BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.tail.map(_.toDouble)
    val got = PrefixSum.runningSum(
        rows.toDF("id", "bkt", "v").repartition(13),
        bucket = col("bkt"), order = Seq(col("id")), value = col("v"), outCol = "run")
      .orderBy("id").collect().map(_.getDouble(3))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-9, s"row $i: $g != $w")
    }
    // bitwise identical across partitionings (decimal phases)
    val got2 = PrefixSum.runningSum(rows.toDF("id", "bkt", "v").coalesce(1),
        bucket = col("bkt"), order = Seq(col("id")), value = col("v"), outCol = "run")
      .orderBy("id").collect().map(_.getDouble(3))
    assert(got.toSeq == got2.toSeq)
  }

  test("bucket monotone in order is required only coarsely: one bucket works") {
    val got = PrefixSum.runningSum(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v"),
        bucket = lit(0), order = Seq(col("id")), value = col("v"), outCol = "run")
      .orderBy("id").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 3.0, 6.0))
  }
}
