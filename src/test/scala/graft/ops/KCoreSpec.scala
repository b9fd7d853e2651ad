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

  test("direction and duplicate edges do not matter") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = KCore.kCore(messy, "src", "dst", k = 2, rounds = 5)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
