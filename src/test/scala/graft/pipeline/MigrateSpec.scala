package graft.pipeline

import graft.SparkSpec

class MigrateSpec extends SparkSpec {
  import spark.implicits._

  private def staging = Seq(
    (1L, "doc1", true), (2L, "doc2", true), (3L, "doc3", true),
    (4L, "already-migrated", false),
  ).toDF("id", "body", "just_insert").repartition(1) // one batch per group

  test("migrate acks only successfully written batches; failures stay staged (§3.3 fixed)") {
    val out = Migrate.migrate(staging, "id", batchSize = 1) { batch =>
      if (batch.exists(_.getLong(0) == 2L)) sys.error("index rejected")
    }.select("id", "just_insert").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("a bad id row fails only ITS batch (ack extraction is eager, inside the try)") {
    // Pre-fix the ack ids were a lazy iterator evaluated AFTER the
    // try/catch exited, so a null id escaped the per-batch failure
    // policy and aborted the task (after retries, the whole job).
    val withBad = Seq(
      (Some(1L), "ok", true), (Option.empty[Long], "bad-id", true),
      (Some(3L), "ok", true))
      .toDF("id", "body", "just_insert").repartition(1)
    var written = 0
    val out = Migrate.migrate(withBad, "id", batchSize = 1) { _ => written += 1 }
      .select("id", "just_insert").as[(Option[Long], Boolean)].collect()
      .map { case (id, ji) => id -> ji }.toMap
    // good batches acked; the bad-id batch stays staged AND was never
    // written (ids are materialized before the write so an unackable
    // batch is not delivered)
    assert(out == Map(Some(1L) -> false, Option.empty[Long] -> true, Some(3L) -> false),
      s"got $out")
  }

  test("second migrate pass retries only the failed doc") {
    val afterFirst = Migrate.migrate(staging, "id", 1) { batch =>
      if (batch.exists(_.getLong(0) == 2L)) sys.error("down")
    }
    val afterSecond = Migrate.migrate(afterFirst, "id", 1)(_ => ()) // index healthy now
    assert(afterSecond.filter("just_insert").count() == 0)
  }
}
