package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(ids: Long*) = ids.map(Tuple1(_)).toDF("id")

  test("iteration checkpoints are released per round (the Clusters leak class)") {
    val n = nodes(0L, 1L, 2L, 3L)
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("s", "d")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pr = PageRank.run(n, "id", e, "s", "d", iters = 6)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.size <= 1,
      s"PageRank left ${after.size} checkpoints registered (only the final " +
        "pr the returned plan reads may remain)")
    assert(pr.count() == 4)
  }

  test("a sink every node points at accumulates the highest rank") {
    // star: 1,2,3 → 0 (0 dangles — its mass drops, teleport keeps leaves alive)
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val pr = PageRank.run(nodes(0L, 1L, 2L, 3L), "id", e, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L))
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L)) // symmetric leaves tie exactly
  }

  test("dangling node keeps only teleport mass; totals reflect the drop") {
    val e = Seq((0L, 1L)).toDF("src", "dst") // node 1 dangles
    val pr = PageRank.run(nodes(0L, 1L), "id", e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // teleport = 0.15/2; node 0 receives nothing, node 1 gets 0.85 * 0.5
    assert(math.abs(pr(0L) - 0.075) < 1e-12)
    assert(math.abs(pr(1L) - (0.075 + 0.85 * 0.5)) < 1e-12)
  }

  test("out-edges split mass by out-degree") {
    // 0 → {1,2}: after one round each gets 0.85 * (1/3) * (1/2)
    val e = Seq((0L, 1L), (0L, 2L)).toDF("src", "dst")
    val pr = PageRank.run(nodes(0L, 1L, 2L), "id", e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) == pr(2L))
    assert(math.abs(pr(1L) - (0.05 + 0.85 * (1.0 / 3.0) * 0.5)) < 1e-9)
  }

  test("weighted: uniform weights reduce to the unweighted ranks") {
    val e = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 1L)).toDF("src", "dst")
    val ew = e.withColumn("w", lit(0.5))
    val ns = nodes(0L, 1L, 2L)
    val a = PageRank.run(ns, "id", e, "src", "dst", iters = 5)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = PageRank.runWeighted(ns, "id", ew, "src", "dst", "w", iters = 5)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("weighted: heavier edge carries more rank") {
    // 0 splits 0.9/0.1 between 1 and 2
    val e = Seq((0L, 1L, 0.9), (0L, 2L, 0.1)).toDF("src", "dst", "w")
    val pr = PageRank.runWeighted(nodes(0L, 1L, 2L), "id", e, "src", "dst", "w",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) > pr(2L))
    assert(math.abs((pr(1L) - 0.05) / (pr(2L) - 0.05) - 9.0) < 1e-6)
  }

  test("ranks are partition-order independent (decimal contributions)") {
    val rng = new scala.util.Random(7)
    val es = (1 to 300).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val ns = nodes(0L until 40L: _*)
    val a = PageRank.run(ns, "id", es.toDF("src", "dst"), "src", "dst", iters = 6)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = PageRank.run(ns.repartition(17), "id",
        es.toDF("src", "dst").repartition(13), "src", "dst", iters = 6)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }
}
