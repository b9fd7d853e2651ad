package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import JaccardSim.jaccard_sim

class JaccardSimSpec extends SparkSpec {
  import spark.implicits._

  private def declarative = (a: org.apache.spark.sql.Column,
                             b: org.apache.spark.sql.Column) =>
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  test("kernel equals size(array_intersect)/size(array_union) on enumerated edges") {
    def s(xs: java.lang.Long*): Seq[Option[Long]] =
      xs.map(x => Option(x).map(_.longValue()))
    val cases: Seq[(Seq[Option[Long]], Seq[Option[Long]])] = Seq(
      (s(1L, 2L, 3L), s(2L, 3L, 4L)),                    // partial overlap
      (s(1L, 2L), s(1L, 2L)),                            // identical
      (s(1L, 2L), s(3L, 4L)),                            // disjoint
      (s(1L, 1L, 2L, 2L), s(2L, 2L, 2L, 5L)),            // duplicates (set semantics)
      (s(1L), s()),                                      // one empty
      (s(Long.MinValue, Long.MaxValue, 0L), s(0L, Long.MinValue)), // extremes
      (s(null, 1L), s(1L, 2L)),                          // null element one side
      (s(null, 1L), s(null, 2L)),                        // null element both sides
      (s(null), s(null))                                 // null-only
    )
    val df = cases.toDF("a", "b")
    val both = df.select(
      jaccard_sim(col("a"), col("b")).as("k"),
      declarative(col("a"), col("b")).as("d")).collect()
    both.zip(cases).foreach { case (r, c) =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"kernel ${r.getDouble(0)} != declarative ${r.getDouble(1)} for $c")
    }
  }

  test("empty-vs-empty returns 1.0 (documented divergence: declarative throws under ANSI)") {
    val df = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val r = df.select(jaccard_sim(col("a"), col("b")).as("k")).head()
    assert(r.getDouble(0) == 1.0)
    intercept[Exception] { // the form it replaces is not even defined here
      df.select(declarative(col("a"), col("b")).as("d")).collect()
    }
  }

  test("null ARRAY propagates null") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(jaccard_sim(col("a"), col("b"))).head().isNullAt(0))
  }

  test("property: kernel == declarative on random long multisets (ScalaCheck)") {
    import org.scalacheck.Gen
    val params = Gen.Parameters.default
    val listGen = Gen.listOfN(40, Gen.chooseNum(-20L, 20L)) // small domain forces overlaps+dups
    val pairs = (0 until 100).flatMap { i =>
      for {
        a <- listGen.apply(params, org.scalacheck.rng.Seed(i.toLong))
        b <- listGen.apply(params, org.scalacheck.rng.Seed(i.toLong + 1000))
      } yield (a, b)
    }
    assert(pairs.size >= 90)
    val df = pairs.toDF("a", "b")
    val rows = df.select(jaccard_sim(col("a"), col("b")).as("k"),
      declarative(col("a"), col("b")).as("d")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"kernel ${r.getDouble(0)} != declarative ${r.getDouble(1)}")
    }
  }

  test("participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
      .select(jaccard_sim(col("sh"), col("sh")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[jaccard_sim.*"), s"plan was:\n$plan")
    assert(df.filter(col("j") =!= 1.0).count() == 0) // self-jaccard is 1
  }
}
