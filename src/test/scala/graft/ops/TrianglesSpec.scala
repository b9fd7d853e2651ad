package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    Triangles.countPerNode(nodes.toDF("id"), "id",
        edges.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap

  test("counts the K4 clique: 4 triangles, every node in 3, clustering 1") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val out = run(nodes, edges)
    for (n <- nodes) {
      val (deg, tri, clust) = out(n)
      assert(deg === 3L && tri === 3L && clust === Some(1.0))
    }
  }

  test("a path has no triangles; isolated nodes zero-filled, clustering NULL") {
    val out = run(Seq(0L, 1L, 2L, 3L, 9L), Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(out(1L) === ((2L, 0L, Some(0.0))))
    assert(out(0L) === ((1L, 0L, None))) // degree < 2 → NULL clustering
    assert(out(9L) === ((0L, 0L, None)))
  }

  test("direction, duplicates and self-loops are ignored") {
    val messy = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 0L),
      (0L, 0L), (1L, 1L), (0L, 1L))
    val out = run(Seq(0L, 1L, 2L), messy)
    for (n <- Seq(0L, 1L, 2L)) assert(out(n) === ((2L, 1L, Some(1.0))))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // 0-1-2 and 0-1-3
    val out = run(Seq(0L, 1L, 2L, 3L),
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (0L, 3L)))
    assert(out(0L)._2 === 2L && out(1L)._2 === 2L)
    assert(out(2L)._2 === 1L && out(3L)._2 === 1L)
    // deg(0)=3, 2 triangles → clustering 2*2/(3*2) = 2/3
    assert(math.abs(out(0L)._3.get - 2.0 / 3.0) < 1e-6)
  }
}
