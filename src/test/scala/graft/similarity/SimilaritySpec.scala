package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.SimilarityQueries

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine: hand-checked values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
      .select(Cosine.toDouble(col("a")).as("a"), Cosine.toDouble(col("b")).as("b"))
    val row = df.select(
      Cosine.dot(col("a"), col("b")).as("d"),
      Cosine.norm(col("a")).as("na"),
      Cosine.cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(row.getDouble(0) == 2.0)
    assert(row.getDouble(1) == 3.0)
    assert(math.abs(row.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1.0 (within fp)") {
    val df = Seq(Seq(0.3f, -0.7f, 0.2f)).toDF("a")
      .select(Cosine.toDouble(col("a")).as("a"))
    val c = df.select(Cosine.cosine(col("a"), col("a")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine with a ZERO vector is 0.0, never NaN (NaN sorts/compares greatest)") {
    // hashEmbeddingDF emits a zero vector for token-less docs; raw 0/0
    // would be NaN, which Spark evaluates as >= any tau and ranks first
    // in sim-desc top-k — a zero vector would 'near-duplicate' its whole
    // dedup cell and win every rerank. The guard scores it 0.0.
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("z", "v")
      .select(Cosine.toDouble(col("z")).as("z"), Cosine.toDouble(col("v")).as("v"))
    val r = df.select(
      Cosine.cosine(col("z"), col("v")).as("zv"),
      Cosine.cosine(col("z"), col("z")).as("zz")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0, s"got $r")
    assert(df.filter(Cosine.cosine(col("z"), col("v")) >= 0.5).count() == 0)
  }

  test("planeWeight is deterministic and in [-1, 1)") {
    val w1 = RandomHyperplaneLSH.planeWeight(3, 2, 17)
    val w2 = RandomHyperplaneLSH.planeWeight(3, 2, 17)
    assert(w1 == w2 && w1 >= -1.0 && w1 < 1.0)
    assert(RandomHyperplaneLSH.planeWeight(0, 0, 0) != RandomHyperplaneLSH.planeWeight(0, 0, 1))
  }

  test("LSH buckets: identical vectors share every bucket; candidates include self-similar pair") {
    val v = Seq.tabulate(8)(i => 0.1f * (i + 1))
    val df = Seq((0L, v), (10L, v), (11L, v.map(x => -x))).toDF("vec_id", "embedding")
      .select(col("vec_id"), Cosine.toDouble(col("embedding")).as("vec"))
    val q = df.filter(col("vec_id") < 10)
    val c = df.filter(col("vec_id") >= 10)
    val cands = RandomHyperplaneLSH.candidates(q, c, "vec_id", "vec",
      numTables = 4, bits = 4, dims = 8)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 10L)))      // identical vector always collides
    assert(!cands.contains((0L, 11L)))     // antipodal vector never collides
  }

  test("selfCandidates: hot-bucket cap drops saturated buckets, no-op when slack") {
    // 20 identical vectors saturate every bucket of every table; one
    // antipodal vector sits alone. Uncapped: 20×19 ordered pairs.
    val v = Seq.tabulate(8)(i => 0.1f * (i + 1))
    val rows = Seq.tabulate(20)(i => (i.toLong, v)) :+ (99L, v.map(x => -x))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Cosine.toDouble(col("embedding")).as("vec"))
    def pairs(cap: Int) = RandomHyperplaneLSH.selfCandidates(df, "vec_id", "vec",
      numTables = 4, bits = 4, dims = 8, ordered = true, maxBucket = cap)
      .as[(Long, Long)].collect().toSet
    assert(pairs(Int.MaxValue).size == 20 * 19 / 2)
    assert(pairs(64) == pairs(Int.MaxValue))    // slack cap is output-invisible
    assert(pairs(10).isEmpty)                    // every shared bucket is over-full
    // the audit names exactly the buckets the cap would drop
    val over = RandomHyperplaneLSH.oversizedBuckets(df, "vec_id", "vec",
      numTables = 4, bits = 4, dims = 8, maxBucket = 10)
      .as[(Int, Int, Long)].collect()
    assert(over.length == 4 && over.forall(_._3 == 20L))
    assert(RandomHyperplaneLSH.oversizedBuckets(df, "vec_id", "vec",
      numTables = 4, bits = 4, dims = 8, maxBucket = 64).isEmpty)
  }

  test("selfCandidates ordered=false emits both directions of each pair") {
    val v = Seq.tabulate(8)(i => 0.1f * (i + 1))
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
      .select(col("vec_id"), Cosine.toDouble(col("embedding")).as("vec"))
    val both = RandomHyperplaneLSH.selfCandidates(df, "vec_id", "vec",
      numTables = 4, bits = 4, dims = 8, ordered = false)
      .as[(Long, Long)].collect().toSet
    assert(both == Set((1L, 2L), (2L, 1L)))
  }

  test("ANN recall vs exact baseline on sf0.001 (report + floor)") {
    val dir = "/root/testdata/sf0.001"
    val exact = SimilarityQueries.q21CosineTopK(spark, dir)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toMap
    val ann = SimilarityQueries.q22AnnLsh(spark, dir)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toMap
    val hits = exact.count { case (q, v) => ann.get(q).contains(v) }
    info(s"ANN top-1 recall: $hits/${exact.size} (candidates found for ${ann.size}/10 queries)")
    // random 64-dim data has no planted neighbors; assert the machinery
    // produces candidates for most queries and some true top-1 hits
    assert(ann.size >= 8, s"only ${ann.size} queries had any candidates")
    assert(hits >= 2, s"ANN recalled only $hits true top-1s")
  }

  test("SemanticDedup drops within-cell near-dups keep-lowest-id; cross-cell near-dups survive") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),     // cell 0, keeper
      (2L, Seq(0.999, 0.01)),  // near-dup of 1 in the same cell → dropped
      (3L, Seq(0.0, 1.0)),     // cell 1, unique
      (4L, Seq(0.72, 0.69)),   // cell 0 ┐ cos(4,5) ≈ 0.999 but the pair
      (5L, Seq(0.69, 0.72)),   // cell 1 ┘ straddles cells → both survive
    ).toDF("vec_id", "vec")
    val centroids = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cen_id", "cen_vec")
    val cells = IvfFlat.assign(vecs, "vec_id", "vec", centroids, "cen_id", "cen_vec")
    val dropped = SemanticDedup.dropReport(cells, vecs, "vec_id", "vec", tau = 0.99)
      .select("vec_id", "keeper").as[(Long, Long)].collect().toMap
    assert(dropped == Map(2L -> 1L))
    val surv = SemanticDedup.survivors(cells, vecs, "vec_id", "vec", tau = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(surv == Set(1L, 3L, 4L, 5L))
  }

  test("IvfFlat: identical vector lands in its own centroid's cell; probes are nearest-first") {
    val mk = (id: Long, v: Seq[Double]) => (id, v)
    val corpus = Seq(
      mk(10L, Seq(1.0, 0.0)), mk(11L, Seq(0.0, 1.0)), // centroids
      mk(12L, Seq(0.9, 0.1)), mk(13L, Seq(0.1, 0.9)),
    ).toDF("vec_id", "vec")
    val centroids = corpus.filter(col("vec_id") < 12)
      .select(col("vec_id").as("cen_id"), col("vec").as("cen_vec"))
    val cells = IvfFlat.assign(corpus, "vec_id", "vec", centroids, "cen_id", "cen_vec")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(cells(10L) == 10L && cells(12L) == 10L)
    assert(cells(11L) == 11L && cells(13L) == 11L)
    val queries = Seq(mk(0L, Seq(0.95, 0.05))).toDF("vec_id", "vec")
    val probes = IvfFlat.probes(queries, "vec_id", "vec", centroids, "cen_id", "cen_vec", 2)
      .orderBy("probe_rank").select("cell").as[Long].collect()
    assert(probes.sameElements(Array(10L, 11L)))
  }

  test("recomputeCentroids: per-cell means in dimension order; fixpoint on separated clusters") {
    val corpus = Seq(
      (10L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0)),
      (12L, Seq(0.8, 0.0)), (13L, Seq(0.0, 0.8)),
    ).toDF("vec_id", "vec")
    val centroids = corpus.filter(col("vec_id") < 12)
      .select(col("vec_id").as("cen_id"), col("vec").as("cen_vec"))
    val cells = IvfFlat.assign(corpus, "vec_id", "vec", centroids, "cen_id", "cen_vec")
    val next = IvfFlat.recomputeCentroids(cells, corpus, "vec_id", "vec")
      .as[(Long, Long, Seq[Double])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(next(10L) == (2L, Seq(0.9, 0.0))) // mean of (1,0) and (.8,0)
    assert(next(11L) == (2L, Seq(0.0, 0.9)))
    // a second assign with the new centroids is stable (k-means fixpoint)
    val cen2 = Seq((10L, Seq(0.9, 0.0)), (11L, Seq(0.0, 0.9)))
      .toDF("cen_id", "cen_vec")
    val cells2 = IvfFlat.assign(corpus, "vec_id", "vec", cen2, "cen_id", "cen_vec")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(cells2 == Map(10L -> 10L, 12L -> 10L, 11L -> 11L, 13L -> 11L))
  }

  test("q21 brute-force top-k: ranks are 1..5 per query and sims non-increasing") {
    val out = SimilarityQueries.q21CosineTopK(spark, "/root/testdata/sf0.001")
      .select("query_id", "rank", "sim").as[(Long, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to 5))
      assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("PQ: codes are in range, one per (vector, subspace); exact duplicate is found") {
    import graft.similarity.ProductQuantizer
    val rng = new scala.util.Random(3)
    def vec() = Array.fill(16)(rng.nextFloat() * 2 - 1)
    val corpusRows = (10L to 60L).map(i => (i, vec()))
    val corpus = corpusRows.toDF("vec_id", "vec")
    val seed = corpus.filter(col("vec_id") < 18) // 8 codewords
    // query 1 duplicates corpus vector 42 exactly
    val dup = corpusRows.find(_._1 == 42L).get._2
    val queries = Seq((1L, dup), (2L, vec())).toDF("vec_id", "vec")

    val cb = ProductQuantizer.codebooks(seed, "vec_id", "vec", numSub = 4, subDim = 4)
    assert(cb.count() == 4 * 8)
    val codes = ProductQuantizer.encode(corpus, "vec_id", "vec", cb, 4, 4)
    assert(codes.count() == 51 * 4)
    val range = codes.select(min("code"), max("code")).as[(Int, Int)].collect()(0)
    assert(range._1 >= 0 && range._2 <= 7)

    // an exact duplicate attains the minimum possible ADC distance, so it
    // must survive any shortlist and win the exact rerank
    val top = ProductQuantizer.searchTop1(queries, corpus, seed, "vec_id", "vec",
        numSub = 4, subDim = 4, shortlist = 5)
      .filter(col("query_id") === 1L)
      .select("vec_id").as[Long].collect()
    assert(top.sameElements(Array(42L)))
  }

  test("IVFPQ composition: IVF cell pruning + ADC scoring + exact rerank finds the duplicate") {
    import graft.similarity.ProductQuantizer
    val rng = new scala.util.Random(9)
    def vec() = Array.fill(16)(rng.nextFloat() * 2 - 1)
    val corpusRows = (10L to 80L).map(i => (i, vec()))
    val corpus = corpusRows.toDF("vec_id", "vec")
    val dup = corpusRows.find(_._1 == 55L).get._2
    val queries = Seq((1L, dup)).toDF("vec_id", "vec")
    val centroids = corpus.filter(col("vec_id") < 18)
      .select(col("vec_id").as("cen_id"), col("vec").as("cen_vec"))

    // IVF: restrict candidates to probed cells (prune), then PQ: ADC-score
    // ONLY those candidates (compressed scan), then exact rerank — the
    // IVFPQ layout, composed from the two existing operators.
    val cells = IvfFlat.assign(corpus, "vec_id", "vec", centroids, "cen_id", "cen_vec")
    val probes = IvfFlat.probes(queries, "vec_id", "vec", centroids, "cen_id", "cen_vec", nprobe = 3)
    val cands = IvfFlat.candidates(probes, cells, "vec_id", "vec_id")

    val seed = corpus.filter(col("vec_id") < 18)
    val cb = ProductQuantizer.codebooks(seed, "vec_id", "vec", 4, 4)
    val codes = ProductQuantizer.encode(corpus, "vec_id", "vec", cb, 4, 4)
      .join(cands.select(col("cand_id").as("vec_id")).distinct(), Seq("vec_id"))
    val table = ProductQuantizer.adcTable(queries, "vec_id", "vec", cb, 4, 4)
    val scored = ProductQuantizer.adcScores(codes, "vec_id", table)
    val shortlist = scored.orderBy(col("adc").asc, col("cand_id").asc).limit(8)
    val top = shortlist
      .join(corpus.select(col("vec_id").as("cand_id"), col("vec").as("cv")), "cand_id")
      .join(queries.select(col("vec_id").as("query_id"), col("vec").as("qv")), "query_id")
      .withColumn("sim", Cosine.cosine(col("qv"), col("cv")))
      .orderBy(col("sim").desc, col("cand_id").asc)
      .select("cand_id").as[Long].collect()
    // the duplicate's cell is certainly probed (its centroid distance is
    // the query's own nearest-centroid distance) and its ADC is minimal
    assert(top.head == 55L)
  }

  test("PQ ADC scores are deterministic across repartitioning (decimal sums)") {
    import graft.similarity.ProductQuantizer
    val rng = new scala.util.Random(4)
    val corpus = (10L to 40L).map(i => (i, Array.fill(16)(rng.nextFloat()))).toDF("vec_id", "vec")
    val queries = (1L to 3L).map(i => (i, Array.fill(16)(rng.nextFloat()))).toDF("vec_id", "vec")
    val seed = corpus.filter(col("vec_id") < 18)
    val cb = ProductQuantizer.codebooks(seed, "vec_id", "vec", 4, 4)
    def run(c: org.apache.spark.sql.DataFrame) = {
      val codes = ProductQuantizer.encode(c, "vec_id", "vec", cb, 4, 4)
      val table = ProductQuantizer.adcTable(queries, "vec_id", "vec", cb, 4, 4)
      ProductQuantizer.adcScores(codes, "vec_id", table)
        .orderBy("query_id", "cand_id").collect().map(_.toSeq).toSeq
    }
    assert(run(corpus) == run(corpus.repartition(11)))
  }
}
