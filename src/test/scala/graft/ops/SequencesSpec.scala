package graft.ops

import graft.SparkSpec

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  // user 1: A B A B ; user 2: B A  (ordered by us, event_id)
  private def ev = Seq(
    (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "A"),
    (1L, 4L, 40L, "B"), (2L, 5L, 10L, "B"), (2L, 6L, 20L, "A"))
    .toDF("user_id", "event_id", "us", "event_type")

  test("transitions counts consecutive pairs and row-normalizes") {
    val got = Sequences.transitions(ev, "user_id", Seq("us", "event_id"),
        "event_type")
      .select("from_type", "to_type", "n", "prob")
      .as[(String, String, Long, Double)].collect().toSet
    // from A: A→B ×2 (u1); from B: B→A ×2 (u1 + u2)
    assert(got == Set(("A", "B", 2L, 1.0), ("B", "A", 2L, 1.0)))
  }

  test("transitions never crosses users and respects the tiebreaker") {
    // tied timestamps: event_id orders C before D
    val tied = Seq((1L, 1L, 10L, "C"), (1L, 2L, 10L, "D"))
      .toDF("user_id", "event_id", "us", "event_type")
    val got = Sequences.transitions(tied, "user_id", Seq("us", "event_id"),
        "event_type")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(got == Set(("C", "D")))
  }

  test("topPaths ranks 3-step paths with deterministic tie-break") {
    val got = Sequences.topPaths(ev, "user_id", Seq("us", "event_id"),
        "event_type", k = 2)
      .as[(String, Long)].collect().toSeq
    // u1 paths: A>B>A, B>A>B — tie at n=1, path text breaks it
    assert(got == Seq(("A>B>A", 1L), ("B>A>B", 1L)))
  }
}
