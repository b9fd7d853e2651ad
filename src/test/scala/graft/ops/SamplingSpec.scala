package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 200L).map(i => (i, if (i <= 100) 1.0 else 100.0))
  private def df = rows.toDF("id", "w")

  test("weighted sample is deterministic across reruns and repartitioning") {
    val a = Sampling.weightedSample(df, "id", col("w"), 20)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", col("w"), 20)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 20)
  }

  test("higher weights dominate the sample") {
    val picked = Sampling.weightedSample(df, "id", col("w"), 20)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ > 100L)
    // ids 101..200 carry 100x the weight of 1..100 — expect the sample
    // to be nearly all heavy rows (probability of even 5 light picks is
    // vanishing).
    assert(heavy >= 15, s"only $heavy of 20 picks were heavy-weighted")
  }

  test("null / zero / negative weights are EXCLUDED, never auto-selected") {
    // A-ES is defined for w > 0. Unfiltered, a null weight yields a null
    // race key and a negative weight a negative key — both sort before
    // every valid key under asc and would deterministically occupy
    // sample slots.
    val bad = Seq((900L, Option.empty[Double]), (901L, Some(-5.0)), (902L, Some(0.0)))
    val mixed = (rows.map { case (i, w) => (i, Some(w)) } ++ bad).toDF("id", "w")
    val picked = Sampling.weightedSample(mixed, "id", col("w"), 20)
      .select("id").as[Long].collect().toSet
    assert(picked.intersect(Set(900L, 901L, 902L)).isEmpty,
      s"bad-weight rows leaked into the sample: $picked")
    assert(picked.size == 20)
  }

  test("race keys are reproducible values, not rand()") {
    val k1 = df.select(Sampling.raceKey(col("id"), col("w")).as("k"))
      .as[Double].collect().toSeq
    val k2 = df.select(Sampling.raceKey(col("id"), col("w")).as("k"))
      .as[Double].collect().toSeq
    assert(k1 == k2)
  }
}
