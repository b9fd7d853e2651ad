package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import SetIntersectSize.set_intersect_size

class SetIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("long arrays: kernel equals size(array_intersect) on enumerated edges") {
    def s(xs: java.lang.Long*): Seq[Option[Long]] =
      xs.map(x => Option(x).map(_.longValue()))
    val cases = Seq(
      (s(1L, 2L, 3L), s(2L, 3L, 4L)),
      (s(1L, 1L, 2L), s(2L, 2L, 5L)),          // dups count once
      (s(1L), s()),                            // one empty
      (s(), s()),                              // both empty
      (s(Long.MinValue, 0L), s(0L, Long.MinValue)),
      (s(null, 1L), s(1L)),                    // null one side: not common
      (s(null, 1L), s(null)),                  // null both sides: common
    )
    val rows = cases.toDF("a", "b").select(
      set_intersect_size(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("d")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"kernel ${r.getInt(0)} != ${r.getInt(1)} for $c")
    }
  }

  test("string arrays: kernel equals size(array_intersect), incl. unicode + empty strings") {
    val cases = Seq(
      (Seq("a", "b", "b"), Seq("b", "c")),
      (Seq("", "a"), Seq("", "b")),             // empty string is a member
      (Seq("ß", "日本", "a"), Seq("日本", "ss")), // unicode binary compare
      (Seq.empty[String], Seq("x")),
      (Seq("dup", "dup"), Seq("dup", "dup")),
    )
    val rows = cases.toDF("a", "b").select(
      set_intersect_size(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("d")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"kernel ${r.getInt(0)} != ${r.getInt(1)} for $c")
    }
  }

  test("property: kernel == declarative on random multisets (ScalaCheck)") {
    import org.scalacheck.Gen
    val params = Gen.Parameters.default
    val longs = Gen.listOfN(30, Gen.chooseNum(-10L, 10L))
    val strs = Gen.listOfN(30, Gen.oneOf("a", "bb", "c", "", "dd", "e", "日"))
    val lpairs = (0 until 60).flatMap { i =>
      for {
        a <- longs(params, org.scalacheck.rng.Seed(i.toLong))
        b <- longs(params, org.scalacheck.rng.Seed(i + 500L))
      } yield (a, b)
    }
    val lr = lpairs.toDF("a", "b").select(
      set_intersect_size(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("d")).collect()
    lr.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val spairs = (0 until 60).flatMap { i =>
      for {
        a <- strs(params, org.scalacheck.rng.Seed(i + 1000L))
        b <- strs(params, org.scalacheck.rng.Seed(i + 1500L))
      } yield (a, b)
    }
    val sr = spairs.toDF("a", "b").select(
      set_intersect_size(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("d")).collect()
    sr.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("null ARRAY propagates null; participates in whole-stage codegen") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(set_intersect_size(col("a"), col("b"))).head().isNullAt(0))
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
      .select(set_intersect_size(col("sh"), col("sh")).as("i"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[set_intersect_size.*"),
      s"plan was:\n$plan")
  }
}
