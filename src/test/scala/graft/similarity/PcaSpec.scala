package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points strung along (0.6, 0.8, 0, 0) with tiny orthogonal noise:
  // the dominant direction is unambiguous
  private def corpus = Seq(
    (1L, Array(6f, 8f, 0.1f, 0f)),
    (2L, Array(12f, 16f, -0.1f, 0f)),
    (3L, Array(18f, 24f, 0.2f, 0f)),
    (4L, Array(24f, 32f, -0.2f, 0f))
  ).toDF("vec_id", "embedding")

  test("power iteration recovers the dominant direction, sign-canonicalized") {
    val xc = Pca.centered(corpus, "vec_id", "embedding")
    val v = Pca.principalComponent(xc, dims = 4, iters = 20)
    // the orthogonal noise tilts the true eigenvector by O(noise²/gap):
    // ~1e-4 here, so assert at that scale, not machine precision
    assert(math.abs(v(0) - 0.6) < 1e-3, v.mkString(","))
    assert(math.abs(v(1) - 0.8) < 1e-3) // largest |component| positive
    assert(math.abs(v(2)) < 0.05 && math.abs(v(3)) < 1e-9)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("projections are the centered coordinates along the component") {
    val xc = Pca.centered(corpus, "vec_id", "embedding")
    val v = Pca.principalComponent(xc, dims = 4, iters = 20)
    val p = Pca.project(xc, "vec_id", v).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // t values 10,20,30,40 centered at 25
    assert(math.abs(p(1L) - (-15.0)) < 1e-2, p)
    assert(math.abs(p(2L) - (-5.0)) < 1e-2)
    assert(math.abs(p(3L) - 5.0) < 1e-2)
    assert(math.abs(p(4L) - 15.0) < 1e-2)
  }

  test("decimal sums make the component bit-identical across partitionings") {
    val one = Pca.centered(corpus.coalesce(1), "vec_id", "embedding")
    val many = Pca.centered(corpus.repartition(8), "vec_id", "embedding")
    val v1 = Pca.principalComponent(one, dims = 4, iters = 6)
    val v8 = Pca.principalComponent(many, dims = 4, iters = 6)
    assert(v1.toSeq == v8.toSeq) // exact, not approximate
  }

  test("treeAggregate rounds are bit-identical to the relational round form") {
    // the r15 rewrite replays the old DataFrame round (dot -> posexplode
    // -> per-term decimal(28,12) cast -> sum by dim) as an RDD
    // treeAggregate; this pins the equivalence on a corpus with the
    // nasty rows the old form skipped via null poisoning: a null
    // element, a wrong-length vector, and mixed partitioning
    val nasty = Seq(
      (1L, Array[java.lang.Float](6f, 8f, 0.1f, 0f)),
      (2L, Array[java.lang.Float](12f, 16f, -0.1f, 0f)),
      (3L, Array[java.lang.Float](18f, null, 0.2f, 0f)), // null element
      (4L, Array[java.lang.Float](24f, 32f, -0.2f)), // wrong length
      (5L, Array[java.lang.Float](-3f, 1f, 2f, 7f))
    ).toDF("vec_id", "embedding")
    val xc = Pca.centered(nasty.repartition(3), "vec_id", "embedding")
      .localCheckpoint(true)
    def oldRound(v: Array[Double]): Array[Double] = {
      val vLit = array(v.map(lit): _*)
      val u = xc
        .select(Cosine.dot(col("xv"), vLit).as("s"), col("xv"))
        .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).cast("double").as("u"))
        .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
      Array.tabulate(4)(d => u.getOrElse(d, 0.0))
    }
    // replay the driver loop with the OLD per-round aggregate
    var vOld = Array.fill(4)(1.0 / math.sqrt(4.0))
    for (_ <- 0 until 5) {
      val uArr = oldRound(vOld)
      val n2 = uArr.map(x => new java.math.BigDecimal(x * x)
          .setScale(12, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val norm = math.sqrt(n2.doubleValue())
      if (norm > 0) vOld = uArr.map(_ / norm)
    }
    val lead = vOld.indices.maxBy(d => (math.abs(vOld(d)), -d))
    val vOldCanon = if (vOld(lead) < 0) vOld.map(-_) else vOld
    val vNew = Pca.principalComponent(xc, dims = 4, iters = 5)
    assert(vNew.toSeq == vOldCanon.toSeq) // exact, not approximate
  }

  test("a round's plan has no corpus-sized exchange (dims-keyed agg only)") {
    val xc = Pca.centered(corpus, "vec_id", "embedding")
    val vLit = array(Seq(0.5, 0.5, 0.5, 0.5).map(lit): _*)
    val round = xc
      .select(Cosine.dot(col("xv"), vLit).as("s"), col("xv"))
      .select(col("s"), posexplode(col("xv")).as(Seq("d", "x")))
      .groupBy("d")
      .agg(sum((col("x") * col("s")).cast("decimal(28,12)")).as("u"))
    val plan = round.queryExecution.executedPlan.toString
    // exactly the aggregation exchange (hashpartitioning on d) — no
    // id-keyed exchange, no broadcast of any corpus-derived table
    assert(!plan.contains("vec_id#"), s"corpus-keyed exchange in:\n$plan")
    assert(!plan.toLowerCase.contains("broadcast"), s"broadcast in:\n$plan")
  }
}
