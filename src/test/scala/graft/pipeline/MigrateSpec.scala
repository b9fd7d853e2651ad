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

  test("second migrate pass retries only the failed doc") {
    val afterFirst = Migrate.migrate(staging, "id", 1) { batch =>
      if (batch.exists(_.getLong(0) == 2L)) sys.error("down")
    }
    val afterSecond = Migrate.migrate(afterFirst, "id", 1)(_ => ()) // index healthy now
    assert(afterSecond.filter("just_insert").count() == 0)
  }
}
