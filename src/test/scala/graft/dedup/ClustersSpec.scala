package graft.dedup

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain and separate pair resolve to min-id components") {
    // chain 1-2-3 (one component), pair 7-8, crossing edge order
    val edges = Seq((2L, 1L), (2L, 3L), (8L, 7L)).toDF("a", "b")
    val got = Clusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents: long path needs multiple propagation rounds") {
    // path 1-2-3-...-10: min label must travel 9 hops
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Clusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 10)
    assert(got.forall(_._2 == 1L))
  }

  test("assign: exactly one representative per cluster, labeled with the min id") {
    val edges = Seq((5L, 6L), (6L, 9L), (11L, 12L)).toDF("a", "b")
    val got = Clusters.assign(edges, "a", "b")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(5L -> 5L, 6L -> 5L, 9L -> 5L, 11L -> 11L, 12L -> 11L))
    assert(got.filter(_._3).map(_._1).sorted.sameElements(Array(5L, 11L)))
  }
}
