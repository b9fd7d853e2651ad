package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries
import org.apache.spark.sql.Row

/** q167's redelivery certification — the q86/q147 at-least-once
  * discipline applied to the COMPOSED pipeline: run the entire stream a
  * second time against the same kept/seen tables from a fresh
  * checkpoint (= every micro-batch redelivered). The per-batch dynamic
  * partition overwrite must replace each batch's own output, and the
  * strictly-earlier-batch key probe must reproduce each batch's dedup
  * verdicts (its own run-1 keys are filtered out by batch_id, its
  * predecessors' keys are identical because staging is idempotent) —
  * so the final per-source aggregate is unchanged. */
class StreamingCurationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q167: full redelivery of every micro-batch leaves the kept table unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-q167-spec").toString
    def run(): Array[Row] =
      DedupQueries.streamingCuration(spark, dir, tmp).collect()
    val first = run()
    val redelivered = run()
    assert(first.nonEmpty, "vacuous: pipeline kept nothing at sf0.001")
    assert(redelivered.toSeq == first.toSeq,
      s"redelivery changed the kept aggregate:\n first=${first.toSeq}\n redel=${redelivered.toSeq}")
  }
}
