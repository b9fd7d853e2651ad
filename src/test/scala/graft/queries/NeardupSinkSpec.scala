package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.dedup.MinHashLSH
import graft.expressions.NgramHashes

/** The q147 sink contract under MULTI-batch delivery — the delivery mode
  * the oracle never exercises (`Tables.stream` ships the whole table in
  * one batch today). The K1 partition key must be batch-DISJOINT as well
  * as redelivery-stable: the pre-fix `pmod(doc_id, 8)` key let a later
  * micro-batch's dynamic overwrite silently delete earlier batches'
  * flagged pairs from shared partitions (the q86 bug class). This spec
  * drives `DedupQueries.neardupBatchToSink` through a rate-limited
  * 2-batch reader and asserts (a) cross-batch completeness and (b) full
  * redelivery idempotence. */
class NeardupSinkSpec extends SparkSpec {
  import spark.implicits._

  test("neardup sink survives multi-batch delivery AND full redelivery " +
       "(batch-disjoint + redelivery-stable partition key)") {
    val base = Files.createTempDirectory("graft-ndsink").toString
    val in = s"$base/in"; val out = s"$base/out"
    val mk = (i: Int, tag: String) =>
      (1 to 60).map(w => if (w == 50) tag else s"tok${i}_$w").mkString(" ")
    // history: two docs; batch docs 100 and 200 each near-duplicate one
    // of them (1-token edit of the same 60-token text)
    val history = Seq(1L -> mk(1, "h"), 2L -> mk(2, "h")).toDF("doc_id", "text")
      .select(col("doc_id"),
        NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))
      .localCheckpoint()
    val histBands = MinHashLSH.historyBandRows(history, "doc_id", "sh",
      numHashes = 64, numBands = 16).localCheckpoint()
    // two source FILES -> two micro-batches under maxFilesPerTrigger=1;
    // each file carries one true near-dup so both batches flag something.
    // Doc ids 100 and 204 COLLIDE mod 8 — under the pre-fix pmod key both
    // batches wrote part=4, so batch 1's dynamic overwrite deleted batch
    // 0's (100,1) pair (this spec failed before the lit(batchId) fix)
    Seq(100L -> mk(1, "x"), 101L -> mk(7, "x")).toDF("doc_id", "text")
      .withColumn("source", lit("src1")).coalesce(1)
      .write.parquet(s"$in/f0")
    Seq(204L -> mk(2, "y"), 205L -> mk(8, "y")).toDF("doc_id", "text")
      .withColumn("source", lit("src1")).coalesce(1)
      .write.parquet(s"$in/f1")
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(in).schema
    def deliver(run: Int): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          DedupQueries.neardupBatchToSink(batch, histBands, history, out, batchId)
        }
        .option("checkpointLocation", s"$base/ckpt$run")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    deliver(1)
    val got1 = spark.read.parquet(out)
      .select("batch_id", "history_id").as[(Long, Long)].collect().toSet
    assert(got1 == Set((100L, 1L), (204L, 2L)),
      "a later micro-batch must never overwrite an earlier batch's flagged pairs")
    deliver(2) // full redelivery from a fresh checkpoint
    val got2 = spark.read.parquet(out)
      .select("batch_id", "history_id").as[(Long, Long)].collect().toSet
    assert(got2 == Set((100L, 1L), (204L, 2L)),
      "redelivery must replace itself, not double-append or drop")
  }
}
