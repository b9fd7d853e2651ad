package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ShardedRangeFrameSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, frame: Long) = {
    val w = Window.partitionBy("k").orderBy(col("us")).rangeBetween(-frame, 0)
    df.withColumn("c", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
  }

  private def sharded(df: org.apache.spark.sql.DataFrame, frame: Long, shard: Long) =
    ShardedRangeFrame.trailingAgg(df, Seq("k"), "us", frame, shard,
      Seq("c" -> count(lit(1)), "s" -> sum(col("v"))))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "us", "v", "c", "s").as[(String, Long, Long, Long, Long)]
      .collect().sorted.toSeq

  test("matches the naive low-cardinality window on adversarial keys") {
    // boundary-exact keys: rows AT shard edges, ties, a frame reaching
    // exactly one microsecond short of the previous shard's last row
    val rows = Seq(
      ("a", 0L, 1L), ("a", 99L, 2L), ("a", 100L, 3L), ("a", 100L, 4L),
      ("a", 101L, 5L), ("a", 199L, 6L), ("a", 200L, 7L), ("a", 299L, 8L),
      ("b", 0L, 1L), ("b", 300L, 2L)).toDF("k", "us", "v")
    assert(canon(sharded(rows, frame = 99L, shard = 100L)) ==
      canon(naive(rows, frame = 99L)))
  }

  test("matches on negative order keys (floor-division shard assignment)") {
    val rows = Seq(("a", -250L, 1L), ("a", -101L, 2L), ("a", -100L, 3L),
      ("a", -1L, 4L), ("a", 0L, 5L), ("a", 99L, 6L)).toDF("k", "us", "v")
    assert(canon(sharded(rows, frame = 99L, shard = 100L)) ==
      canon(naive(rows, frame = 99L)))
  }

  test("matches on randomized inputs across shard widths") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (s"k${rnd.nextInt(3)}", rnd.nextLong() % 1000L, rnd.nextInt(10).toLong)
    }.toDF("k", "us", "v")
    for (shard <- Seq(64L, 100L, 1000L)) {
      assert(canon(sharded(rows, frame = 63L, shard = shard)) ==
        canon(naive(rows, frame = 63L)), s"shard=$shard")
    }
  }

  test("rejects a shard width that does not exceed the frame") {
    val rows = Seq(("a", 0L, 1L)).toDF("k", "us", "v")
    intercept[IllegalArgumentException] {
      sharded(rows, frame = 100L, shard = 100L)
    }
  }

  test("parallelism: the window runs per (key, shard), not per key") {
    val rows = Seq.tabulate(400) { i => ("only", i.toLong, 1L) }
      .toDF("k", "us", "v")
    val out = sharded(rows, frame = 99L, shard = 100L)
    // 4 shards of one key → the window's exchange has 4 distinct keys
    val shards = rows.select(
        (((col("us") - pmod(col("us"), lit(100L))) / 100L).cast("long")).as("s"))
      .distinct().count()
    assert(shards == 4)
    assert(canon(out) == canon(naive(rows, frame = 99L)))
  }
}
