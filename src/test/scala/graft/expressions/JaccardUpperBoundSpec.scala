package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import JaccardSim.jaccard_sim
import JaccardUpperBound.jaccard_upper
import TruncHashes.trunc_hashes

/** The two-tier verify's correctness hinges on ONE property: for
  * distinct-element long arrays, jaccard_upper(trunc(A), trunc(B)) >=
  * jaccard_sim(A, B) — tier 1 may only OVER-generate survivors. These
  * specs check the bound (at both widths), its tightness when no
  * truncation collisions exist, the deliberate counter-case showing why
  * plain truncated Jaccard would be WRONG, and the codegen/type plumbing. */
class JaccardUpperBoundSpec extends SparkSpec {
  import spark.implicits._

  test("property: upper bound >= exact jaccard on random distinct sets, 16 and 32 bit") {
    import org.scalacheck.Gen
    val params = Gen.Parameters.default
    // values spread across the full long range so 16-bit truncation
    // produces real collisions (low 16 bits collide at ~n^2/2^16)
    val listGen = Gen.listOfN(80, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    val overlapGen = Gen.listOfN(40, Gen.chooseNum(-300L, 300L)).map(_.distinct)
    val pairs = (0 until 120).flatMap { i =>
      val (ga, gb) = if (i % 2 == 0) (listGen, listGen) else (overlapGen, overlapGen)
      for {
        a <- ga.apply(params, org.scalacheck.rng.Seed(i.toLong))
        b <- gb.apply(params, org.scalacheck.rng.Seed(i.toLong + 5000))
      } yield (a, b)
    }
    assert(pairs.size >= 100)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      jaccard_sim(col("a"), col("b")).as("exact"),
      jaccard_upper(trunc_hashes(col("a"), 16), trunc_hashes(col("b"), 16)).as("u16"),
      jaccard_upper(trunc_hashes(col("a"), 32), trunc_hashes(col("b"), 32)).as("u32"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(0),
        s"u16 ${r.getDouble(1)} < exact ${r.getDouble(0)}")
      assert(r.getDouble(2) >= r.getDouble(0),
        s"u32 ${r.getDouble(2)} < exact ${r.getDouble(0)}")
    }
  }

  test("collision-free inputs: bound is EXACT (trunc is injective on small values)") {
    // values in [0, 30000] survive 16-bit truncation injectively (fit in
    // a signed short), so i_up == i and the bound collapses to equality
    val pairs = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(10L, 20L), Seq(10L, 20L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(30000L, 7L, 900L), Seq(900L, 8L)))
    val df = pairs.toDF("a", "b")
    df.select(jaccard_sim(col("a"), col("b")).as("exact"),
        jaccard_upper(trunc_hashes(col("a"), 16), trunc_hashes(col("b"), 16)).as("u"))
      .collect().foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
          s"collision-free bound ${r.getDouble(1)} != exact ${r.getDouble(0)}")
      }
  }

  test("the counter-case that kills plain truncated Jaccard: colliding INTERSECTION elements") {
    // A = B = {0, 2^16} — both elements truncate to 0. Plain distinct-set
    // Jaccard of the truncated sets is still 1.0 here, so make it adversarial:
    // A = {0, 2^16, 1}, B = {0, 2^16, 2}: exact J = 2/4 = 0.5; truncated
    // DISTINCT sets are {0,1} vs {0,2} -> naive J = 1/3 < 0.5 (the
    // deflation that would WRONGLY drop a true pair). The multiset bound
    // keeps both copies: i_up = 2, J_up = 2/(3+3-2) = 0.5 >= exact.
    val df = Seq((Seq(0L, 65536L, 1L), Seq(0L, 65536L, 2L))).toDF("a", "b")
    val r = df.select(
      jaccard_sim(col("a"), col("b")).as("exact"),
      jaccard_upper(trunc_hashes(col("a"), 16), trunc_hashes(col("b"), 16)).as("u"),
      // the naive form, for the record: distinct-set jaccard of truncations
      jaccard_sim(transform(col("a"), x => pmod(x, lit(65536L))),
        transform(col("b"), x => pmod(x, lit(65536L)))).as("naive"))
      .head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) >= r.getDouble(0), s"bound ${r.getDouble(1)} < exact 0.5")
    assert(r.getDouble(2) < r.getDouble(0), "naive truncated jaccard should deflate here")
  }

  test("cross-collisions only INFLATE the bound (never drop a pair)") {
    // a in A\B and b in B\A colliding: A={65536,1}, B={0,2} — 65536 and 0
    // truncate equal. exact J = 0; bound = 1/(2+2-1) = 1/3 > 0 (a tier-1
    // false positive, killed by tier 2 — selectivity, not correctness).
    val df = Seq((Seq(65536L, 1L), Seq(0L, 2L))).toDF("a", "b")
    val r = df.select(
      jaccard_sim(col("a"), col("b")).as("exact"),
      jaccard_upper(trunc_hashes(col("a"), 16), trunc_hashes(col("b"), 16)).as("u"))
      .head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
  }

  test("edges: empty-vs-empty 1.0, null array null, one empty 0.0") {
    val df = Seq(
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])),
      (Some(Seq(1L)), None),
      (Some(Seq(1L)), Some(Seq.empty[Long]))).toDF("a", "b")
    val rows = df.select(jaccard_upper(
      trunc_hashes(col("a"), 16), trunc_hashes(col("b"), 16)).as("u")).collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("trunc_hashes: length/order preserved, low-bits values, SQL registry") {
    val df = Seq(Seq(-1L, 65537L, 0L, 32768L)).toDF("a")
    val r16 = df.select(trunc_hashes(col("a"), 16).as("t")).head().getSeq[Short](0)
    assert(r16 == Seq[Short](-1, 1, 0, -32768)) // low 16 bits, signed
    val r32 = df.select(trunc_hashes(col("a"), 32).as("t")).head().getSeq[Int](0)
    assert(r32 == Seq(-1, 65537, 0, 32768))
    df.createOrReplaceTempView("trunc_in")
    GraftExtensionsSpecSupport.ensureRegistered(spark)
    val sqlRow = spark.sql(
      "SELECT jaccard_upper(trunc_hashes(a, 16), trunc_hashes(a, 16)) FROM trunc_in").head()
    assert(sqlRow.getDouble(0) == 1.0)
  }

  test("trunc_hashes_distinct: dedups ORIGINAL longs (not truncations), " +
       "handles multisets, nulls, and already-distinct inputs") {
    import TruncHashes.trunc_hashes_distinct
    // dedup happens on the 8-byte values BEFORE truncation: 1 and 65537
    // both truncate to short 1 but are distinct longs, so BOTH survive —
    // collapsing them would shrink i_up below what the multiset-min
    // bound requires. The duplicate 1L collapses.
    val m = Seq(Seq(1L, 65537L, 1L)).toDF("a")
    val got = m.select(trunc_hashes_distinct(col("a"), 16).as("t"))
      .head().getSeq[Short](0)
    assert(got == Seq[Short](1, 1), s"got $got")
    // already-distinct input: BIT-IDENTICAL to the plain kernel —
    // first-occurrence order is part of the contract (shuffle-bytes
    // parity, see the kernel scaladoc)
    val d = Seq(Seq(-1L, 65537L, 0L, 32768L)).toDF("a")
    val plain = d.select(trunc_hashes(col("a"), 16).as("t")).head().getSeq[Short](0)
    val dedup = d.select(trunc_hashes_distinct(col("a"), 16).as("t")).head().getSeq[Short](0)
    assert(dedup == plain)
    // 32-bit width, same first-occurrence order
    val g32 = m.select(trunc_hashes_distinct(col("a"), 32).as("t")).head().getSeq[Int](0)
    assert(g32 == Seq(1, 65537))
    // probe stress: many duplicates + many distincts in one array,
    // exercising table growth and epoch reuse across rows
    val big = (1 to 3).map(r => (0 until 2000).map(i => (i % 700).toLong * 7919 + r))
    val gotBig = big.toDF("a").select(trunc_hashes_distinct(col("a"), 16).as("t"))
      .collect().map(_.getSeq[Short](0))
    big.zip(gotBig).foreach { case (in, out) =>
      val expect = in.distinct.map(v => v.toShort)
      assert(out == expect, s"row dedup mismatch: ${out.take(5)} vs ${expect.take(5)}")
    }
    // cold path: null elements dedup to one (the JaccardSim null contract)
    val n = Seq(Seq(Some(1L), None, Some(1L), None)).toDF("a")
    val gn = n.select(trunc_hashes_distinct(col("a"), 16).as("t"))
      .head().getSeq[java.lang.Short](0)
    assert(gn.length == 2 && gn.count(_ == null) == 1, s"got $gn")
    // empty stays empty
    assert(Seq(Seq.empty[Long]).toDF("a")
      .select(trunc_hashes_distinct(col("a"), 16).as("t")).head().getSeq[Short](0).isEmpty)
  }

  test("participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
      .select(trunc_hashes(col("sh"), 16).as("tr"))
      .select(jaccard_upper(col("tr"), col("tr")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[jaccard_upper.*"), s"plan was:\n$plan")
    assert(df.filter(col("j") =!= 1.0).count() == 0) // self-bound is 1
  }
}

/** Registers graft functions on an already-built test session (the specs
  * share one session; GraftExtensions normally rides the builder). */
object GraftExtensionsSpecSupport {
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
