package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(docs: Seq[(Long, String)], tNum: Int, tDen: Int) =
    PrefixFilterJoin.jaccardJoin(docs.toDF("id", "text"), "id",
        split(col("text"), " "), tNum, tDen)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("matches brute force on a small corpus") {
    val docs = Seq(
      1L -> "a b c d e", 2L -> "a b c d f", 3L -> "a b x y z",
      4L -> "p q r s t", 5L -> "p q r s t", 6L -> "m n")
    val out = join(docs, 3, 5)
    val sets = docs.toMap.view.mapValues(_.split(" ").toSet).toMap
    val brute = for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      i = (sets(a) & sets(b)).size
      u = (sets(a) | sets(b)).size
      if i * 5 >= 3 * u
    } yield (a, b, math.rint(i.toDouble / u * 1e6) / 1e6)
    assert(out.toSeq === brute.sortBy(p => (p._1, p._2)))
    assert(out.nonEmpty) // 1-2 (J=2/3) and 4-5 (J=1) must be present
  }

  test("matches brute force on seeded random corpora across rational thresholds") {
    // small vocab → heavy overlap → pairs cluster AROUND the thresholds,
    // which is where the integer gates (prefix length, length filter,
    // final verify) can misround if anything drifts to doubles
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { _ =>
      val docs = (1L to 14L).map { id =>
        val len = 2 + rnd.nextInt(7)
        id -> Seq.fill(len)(s"w${rnd.nextInt(10)}").mkString(" ")
      }
      val sets = docs.toMap.view.mapValues(_.split(" ").toSet).toMap
      Seq((1, 2), (3, 5), (2, 3), (1, 1)).foreach { case (tn, td) =>
        val out = join(docs, tn, td)
        val brute = (for {
          a <- docs.map(_._1); b <- docs.map(_._1) if a < b
          i = (sets(a) & sets(b)).size
          u = (sets(a) | sets(b)).size
          if i * td >= tn * u
        } yield (a, b, math.rint(i.toDouble / u * 1e6) / 1e6))
          .sortBy(p => (p._1, p._2))
        assert(out.toSeq === brute, s"t=$tn/$td docs=$docs")
      }
    }
  }

  test("keeps the exact-boundary pair a double gate would drop") {
    // |A|=3 ⊂ |B|=5 → J = 3/5 exactly; 0.6*5 in double is 3.0000000000000004
    val docs = Seq(1L -> "a b c", 2L -> "a b c d e")
    val out = join(docs, 3, 5)
    assert(out.toSeq === Seq((1L, 2L, 0.6)))
  }

  test("excludes pairs just below the threshold") {
    // J = 3/7 < 3/5
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c x y")
    assert(join(docs, 3, 5).isEmpty)
  }

  test("duplicate tokens within a doc don't inflate the sets") {
    val docs = Seq(1L -> "a a a b", 2L -> "a b b b")
    assert(join(docs, 1, 1).toSeq === Seq((1L, 2L, 1.0))) // both sets {a,b}
  }
}
