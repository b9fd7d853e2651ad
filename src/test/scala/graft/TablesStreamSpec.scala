package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `Tables.stream` must be the row-wise twin of `Tables.apply` for EVERY
  * table — including events, whose ts column ships in different physical
  * parquet types across driver generations and is normalized by apply().
  * Pre-fix, stream() declared the NORMALIZED schema over the RAW files:
  * an events stream either failed the reader's type match (long-nanos
  * generation) or skipped the ns→us transform entirely. */
class TablesStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream(events) ≡ apply(events): same schema, same rows, real timestamps") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables(spark, dir, "events")
    val streamed = Tables.stream(spark, dir, "events")
    assert(streamed.schema("ts").dataType == batch.schema("ts").dataType,
      s"stream ts type ${streamed.schema("ts").dataType} != batch ${batch.schema("ts").dataType}")
    val out = java.nio.file.Files.createTempDirectory("graft-evstream").toString
    val q = streamed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$out/sink")
      }
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/sink")
    assert(got.count() == batch.count())
    // timestamps are the normalized values, not raw nanos: min/max agree
    val Array(bLo, bHi) = batch.agg(min("ts"), max("ts")).collect()(0).toSeq.toArray
    val Array(sLo, sHi) = got.agg(min("ts"), max("ts")).collect()(0).toSeq.toArray
    assert(bLo == sLo && bHi == sHi, s"ts range diverged: ($sLo,$sHi) vs ($bLo,$bHi)")
  }
}
