package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))

  test("fitParams pivots per-dimension corpus bounds in dimension order") {
    val corpus = vecs((0L, Seq(1.0, -5.0)), (1L, Seq(3.0, 2.0)))
    val row = ScalarQuantizer.fitParams(corpus, "vec")
      .as[(Seq[Double], Seq[Double])].head()
    assert(row == ((Seq(1.0, -5.0), Seq(3.0, 2.0))))
  }

  test("quantized top-k error is bounded by half a code step per dimension") {
    // 8 corpus vectors on a line, query aligned with the first axis: the
    // SQ8 score must be within sum(|q_d| * span_d / 255 / 2) of exact.
    val corpus = vecs((0 until 8).map(i => (10L + i, Seq(i * 1.0, 8.0 - i))): _*)
    val queries = Seq((0L, Seq(2.0, 1.0))).toDF("query_id", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    val got = ScalarQuantizer.topKAsymmetric(corpus, queries, k = 8)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val spans = Seq(7.0, 8.0) // per-dim max-min
    val tol = Seq(2.0, 1.0).zip(spans).map { case (q, s) => q.abs * s / 255 / 2 }.sum + 1e-9
    (0 until 8).foreach { i =>
      val exact = 2.0 * i + (8.0 - i) * 1.0
      assert(math.abs(got(10L + i) - exact) <= tol,
        s"vec ${10 + i}: got ${got(10L + i)}, exact $exact, tol $tol")
    }
  }

  test("zero-span dimensions reconstruct to the constant exactly") {
    val corpus = vecs((10L, Seq(4.0, 1.0)), (11L, Seq(4.0, 3.0)))
    val queries = Seq((0L, Seq(1.0, 0.0))).toDF("query_id", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    val got = ScalarQuantizer.topKAsymmetric(corpus, queries, k = 2)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    // dim 0 has span 0 → recon = 4.0 for both; dim 1 weighted 0
    assert(got(10L) == 4.0 && got(11L) == 4.0)
  }
}
