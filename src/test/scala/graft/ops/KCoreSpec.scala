package graft.ops

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle {1,2,3} + pendant chain 3-4-5: the 2-core is the triangle
  private def g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    .toDF("src", "dst")

  test("2-core peels pendant chains down to the triangle") {
    val got = KCore.kCore(g, "src", "dst", k = 2, rounds = 5)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("peeling cascades: removing a leaf can strand its neighbor") {
    // path 1-2-3: 1 and 3 peel first, then 2 has degree 0 → empty 2-core
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(KCore.kCore(path, "src", "dst", k = 2, rounds = 5).count() == 0)
  }

  test("extra rounds past the fixpoint are no-ops") {
    val a = KCore.kCore(g, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toSet
    val b = KCore.kCore(g, "src", "dst", k = 2, rounds = 9)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("matches an in-memory reference peel on seeded random graphs, k = 2..4") {
    // reference: symmetrize/dedup/de-loop, then delete sub-k nodes until
    // a fixpoint — the definition, with none of the distributed machinery
    def reference(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
      var e = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .filter { case (a, b) => a != b }.distinct.toSet
      var done = false
      while (!done) {
        val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
        val alive = deg.filter(_._2 >= k).keySet
        val next = e.filter { case (a, b) => alive(a) && alive(b) }
        done = next == e
        e = next
      }
      e.groupBy(_._1).map { case (n, es) => n -> es.size }
    }
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(30)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("src", "dst")
      (2 to 4).foreach { k =>
        val got = KCore.kCore(df, "src", "dst", k = k, rounds = 30)
          .as[(Long, Long)].collect().map { case (a, d) => a -> d.toInt }.toMap
        assert(got == reference(edges, k),
          s"k=$k edges=$edges: got $got, want ${reference(edges, k)}")
      }
    }
  }

  test("direction and duplicate edges do not matter") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = KCore.kCore(messy, "src", "dst", k = 2, rounds = 5)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }
  test("peel checkpoints are released per round; the shared symmetrize input survives") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val sym = KCore.symmetrize(g, "src", "dst")
    val core = KCore.kCoreOfSymmetrized(sym, k = 2, rounds = 8)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    // retained: the caller-owned sym + the final peeled edge table the
    // returned plan reads — never one checkpoint per peel round
    assert(after.size <= 2,
      s"kCore left ${after.size} checkpoints registered")
    assert(core.count() == 3) // the triangle survives, sym still usable
    assert(KCore.kCoreOfSymmetrized(sym, k = 3, rounds = 8).count() == 0)
  }

  test("kCoreOfSymmetrized over one shared symmetrize equals kCore per k") {
    // q134's shape: three peels over the same graph share ONE
    // symmetrize/dedup/checkpoint; the split entry point must be
    // result-identical to the self-contained kCore for every k.
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(40)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .toDF("src", "dst")
    val sym = KCore.symmetrize(edges, "src", "dst")
    (2 to 4).foreach { k =>
      val shared = KCore.kCoreOfSymmetrized(sym, k, rounds = 30)
        .as[(Long, Long)].collect().toSet
      val solo = KCore.kCore(edges, "src", "dst", k = k, rounds = 30)
        .as[(Long, Long)].collect().toSet
      assert(shared == solo, s"k=$k: shared $shared != solo $solo")
    }
  }
}
