package graft.sinks

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // dim: key 1 has history (one closed + one open version); keys 2,3 open
  private def dim = Seq(
    (1L, "S1", "2023-01-01", Some("2023-06-01"), false),
    (1L, "S2", "2023-06-01", None, true),
    (2L, "S1", "2023-01-01", None, true),
    (3L, "S9", "2023-01-01", None, true)
  ).toDF("k", "seg", "valid_from", "valid_to", "is_current")

  // updates: key 1 changes (close+reopen), key 2 identical (no-op),
  // key 9 is new; key 3 untouched
  private def upd = Seq(
    (1L, "S3", "2024-01-01"),
    (2L, "S1", "2024-01-01"),
    (9L, "S5", "2024-01-01")
  ).toDF("k", "seg", "eff")

  test("one merge handles change, no-op, insert, untouched, and history") {
    val got = Scd2.merge(dim, upd, "k", Seq("seg"), "eff")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "S1", "2023-01-01", Some("2023-06-01"), false), // history untouched
      (1L, "S2", "2023-06-01", Some("2024-01-01"), false), // closed at eff
      (1L, "S3", "2024-01-01", None, true),                // new version
      (2L, "S1", "2023-01-01", None, true),                // no-op: still open
      (3L, "S9", "2023-01-01", None, true),                // untouched
      (9L, "S5", "2024-01-01", None, true)                 // brand-new key
    ), got.mkString("\n"))
  }

  test("null attributes compare null-safely") {
    val d = Seq((1L, Option.empty[String], "2023-01-01", Option.empty[String], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val sameNull = Seq((1L, Option.empty[String], "2024-01-01")).toDF("k", "seg", "eff")
    val nullToVal = Seq((1L, Option("S1"), "2024-01-01")).toDF("k", "seg", "eff")
    // null -> null is a no-op, not a change
    assert(Scd2.merge(d, sameNull, "k", Seq("seg"), "eff").count() == 1)
    // null -> value closes and reopens
    val got = Scd2.merge(d, nullToVal, "k", Seq("seg"), "eff")
      .orderBy("valid_from").collect()
    assert(got.length == 2 && !got(0).getBoolean(4) && got(1).getBoolean(4))
  }

  test("NULL effCol / NULL valid_from rows are still classified as present " +
       "(presence via markers, not data-column sentinels)") {
    // An update row with a NULL effective date must still close the
    // current version (valid_to = NULL then, which is odd data but not a
    // lost update), and an open row with NULL valid_from must still be
    // SEEN as current (else a second is_current=true version opens
    // without closing the first). Pre-fix, presence was detected via
    // isNotNull on __eff/valid_from, so both rows silently vanished from
    // their join cases.
    val nullFrom = Seq((1L, "S1", Option.empty[String], Option.empty[String], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val upd1 = Seq((1L, "S2", Option("2024-01-01"))).toDF("k", "seg", "eff")
    val got1 = Scd2.merge(nullFrom, upd1, "k", Seq("seg"), "eff")
      .orderBy("is_current").collect()
    // the NULL-valid_from current row was closed; exactly one open row
    assert(got1.length == 2, got1.mkString("\n"))
    assert(!got1(0).getBoolean(4) && Option(got1(0).getString(3)) == Some("2024-01-01"))
    assert(got1(1).getBoolean(4) && got1(1).getString(1) == "S2")

    val d = Seq((1L, "S1", "2023-01-01", Option.empty[String], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val nullEff = Seq((1L, "S2", Option.empty[String])).toDF("k", "seg", "eff")
    val got2 = Scd2.merge(d, nullEff, "k", Seq("seg"), "eff")
      .orderBy("is_current").collect()
    // the update is NOT lost: old version closed, S2 opened
    assert(got2.length == 2, got2.mkString("\n"))
    assert(!got2(0).getBoolean(4) && got2(0).getString(1) == "S1")
    assert(got2(1).getBoolean(4) && got2(1).getString(1) == "S2")
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val once = Scd2.merge(dim, upd, "k", Seq("seg"), "eff")
    val twice = Scd2.merge(once, upd, "k", Seq("seg"), "eff")
    assert(twice.orderBy("k", "valid_from").collect().toSeq ==
      once.orderBy("k", "valid_from").collect().toSeq)
  }
}
