package graft.ops

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute-force top-k on a skewed stream (generous cap)") {
    val rnd = new scala.util.Random(11)
    // Zipf-ish: item i has weight ~ 1/(i+1)
    val stream = Seq.fill(5000)(s"w${(1.0 / (rnd.nextDouble() + 1e-3)).toInt % 40}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    val got = HeavyHitters.topItems(stream.toDF("w").repartition(8), "w", 10, 1024)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == truth, s"$got\n$truth")
  }

  test("a majority item survives even a tiny cap across partitions") {
    // "hot" holds 60% > N/(cap+1) with cap=2 -> guaranteed candidate
    val rnd = new scala.util.Random(5)
    val stream = Seq.fill(3000)(if (rnd.nextDouble() < 0.6) "hot" else s"cold${rnd.nextInt(500)}")
    val got = HeavyHitters.topItems(stream.toDF("w").repartition(16), "w", 1, 2)
      .collect().head
    assert(got.getString(0) == "hot")
    assert(got.getLong(1) == stream.count(_ == "hot")) // exact, not estimated
  }

  test("ties rank deterministically by item") {
    val stream = Seq("b", "b", "a", "a", "c").toDF("w")
    val got = HeavyHitters.topItems(stream, "w", 2, 64)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "b"))
  }
}
