package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Randomized equivalence properties: each distributed operator vs a
  * naive single-process reference implementation on the same data. */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, org.scalacheck.rng.Seed(1000L + i)).foreach(body)
    }
  }

  private val keyGen = Gen.oneOf("k1", "k2", "k3")

  test("asof backward == naive latest-at-or-before on random data") {
    val dataGen = for {
      lefts <- Gen.listOfN(25, Gen.zip(keyGen, Gen.choose(0L, 100L)))
      rights <- Gen.listOfN(25, Gen.zip(keyGen, Gen.choose(0L, 100L)))
    } yield (lefts.zipWithIndex.map { case ((k, t), i) => (s"L$i", k, t) },
      rights.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

    cases(dataGen, 5) { case (lefts, rights) =>
      val lDf = lefts.toDF("lid", "k", "t")
      val rDf = rights.toDF("k", "ts", "eid")
      val got = AsOfJoin.backward(lDf, rDf, "k", "t", "ts", Seq("eid"),
          rightTieBreak = Some("eid"))
        .select("lid", "eid").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val want = lefts.map { case (lid, k, t) =>
        val m = rights.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (m.isEmpty) None
                else Some(m.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want)
    }
  }

  test("bucketed range join == naive containment filter on random intervals") {
    val dataGen = for {
      pts <- Gen.listOfN(30, Gen.choose(0L, 500L))
      ivs <- Gen.listOfN(8, Gen.zip(Gen.choose(0L, 400L), Gen.choose(1L, 150L)))
      width <- Gen.oneOf(7L, 50L, 200L)
    } yield (pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toDouble) },
      ivs.zipWithIndex.map { case ((s, len), i) => (s"w$i", s.toDouble, (s + len).toDouble) },
      width)

    cases(dataGen, 5) { case (pts, ivs, width) =>
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "pt"), ivs.toDF("w", "s", "e"), "pt", "s", "e", width)
        .select("pid", "w").as[(Long, String)].collect().toSet
      val want = (for {
        (pid, p) <- pts
        (w, s, e) <- ivs
        if p >= s && p < e
      } yield (pid, w)).toSet
      assert(got == want)
    }
  }

  test("chunk dedup: totals consistent, kept count == distinct chunks, text reconstructs") {
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.listOfN(12, Gen.listOfN(7, wordGen).map(_.mkString(" ")))
    cases(docGen, 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val ch = graft.dedup.ChunkDedup.chunks(docs, "id", "text", 3)
      // reconstruction: chunks of a doc rejoined == its token stream
      val rebuilt = ch.groupBy("id")
        .agg(array_join(array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
          .getField("chunk"), " ").as("r"))
        .as[(Long, String)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(rebuilt(i.toLong) == t.split("\\s+").mkString(" "))
      }
      val s = graft.dedup.ChunkDedup.survival(docs, "id", "text", 3)
        .select("n_chunks", "n_kept", "n_dropped").as[(Long, Long, Long)].collect()
      s.foreach { case (n, k, d) => assert(n == k + d) }
      val distinctChunks = ch.select("chunk").distinct().count()
      assert(s.map(_._2).sum == distinctChunks)
    }
  }

  test("weighted sample with k >= n returns every row") {
    val df = (1L to 40L).map(i => (i, i.toDouble)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 40L).toSet)
  }
}
