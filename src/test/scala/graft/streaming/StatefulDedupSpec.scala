package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.StatefulDedup.Keyed

class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState dedup: keep-first within TTL, state survives restart (F8/Q6/Q8)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val outDir = Files.createTempDirectory("graft-dedup-out").toString
    val input = MemoryStream[Keyed[String]]
    val out = StatefulDedup.dedupWithTtl(input.toDS())

    // ProcessingTimeTimeout makes the engine run continuous timeout-check
    // batches, starving processAllAvailable — drive each batch with
    // AvailableNow against a shared checkpoint instead (which also proves
    // the dedup state survives a query restart). The memory sink cannot
    // recover from a checkpoint, so write parquet and read it back.
    def runOnce(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", outDir).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.stop()
    }

    input.addData(Keyed("a", "first-a"), Keyed("a", "dup-a-same-batch"), Keyed("b", "first-b"))
    runOnce()
    input.addData(Keyed("a", "dup-a-next-batch"), Keyed("c", "first-c"))
    runOnce()
    val vals = spark.read.parquet(outDir).as[Keyed[String]]
      .collect().map(k => k.key -> k.value).toMap
    assert(vals == Map("a" -> "first-a", "b" -> "first-b", "c" -> "first-c"))
  }
}
