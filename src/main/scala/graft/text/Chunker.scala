package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window passage extraction (RAG / context-window chunking):
  * each document's token stream is cut into fixed-width chunks with a
  * stride smaller than the width, so consecutive chunks overlap — the
  * standard retrieval-corpus preparation step (the reference's article
  * pipeline stops at whole documents; this is the passage-granularity
  * complement of `ChunkDedup`'s aligned non-overlapping chunks).
  *
  * Chunk i covers tokens [i·stride, i·stride+width); the last start is
  * the smallest multiple of stride whose chunk reaches the final token,
  * so every token is covered and no fully-redundant tail chunk is
  * emitted. Docs shorter than one width yield exactly one chunk.
  *
  * Scale: pure per-row compute (tokenize + integer arithmetic) followed
  * by one explode — no shuffle at all; the plan is a single
  * whole-stage-codegen'd scan→project→generate chain. Output carries a
  * content hash so downstream exact passage-dedup (`ExactDedup` on
  * `chunk_md5`) needs no re-tokenization.
  */
object Chunker {

  def chunks(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      // ceil((n - width) / stride) in exact integer arithmetic; doubles
      // here are exact for any corpus with < 2^52-token documents.
      .withColumn("imax",
        when(col("n") <= width, lit(0))
          .otherwise(floor((col("n") - width + stride - 1) / lit(stride)))
          .cast("int"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), col("imax"))).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride + 1)
      .withColumn("chunk", slice(col("toks"), col("start_tok"), lit(width)))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("chunk")).as("n_toks"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
  }
}
