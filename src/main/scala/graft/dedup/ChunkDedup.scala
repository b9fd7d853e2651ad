package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Chunk-level (sub-document) exact deduplication — the C4/RefinedWeb
  * pass that removes REPEATED PASSAGES across a corpus (boilerplate,
  * quoted blocks, syndicated paragraphs) while keeping each document's
  * first occurrence. Document-level dedup (ExactDedup/MinHashLSH) misses
  * these: two distinct docs sharing one paragraph are not near-dups.
  *
  * Unit of dedup: non-overlapping `width`-token windows in token order
  * (a whitespace corpus has no line structure; for line-oriented text
  * swap the chunker for split('\n')). Keep-first policy: the globally
  * first occurrence — minimum (doc_id, chunk_idx) — survives; every
  * later identical chunk is dropped, matching the reference's
  * keep-first duplicate semantics (Q8, `src/base.py:198-208`) applied
  * at passage granularity.
  *
  * Scale: one explode (corpus tokens / width rows) + one groupBy on the
  * chunk hash (map-side combined argmin) + one broadcast-or-shuffle join
  * back. Chunks are joined BY 64-BIT HASH, not text: the shuffle moves
  * 8-byte keys, and a hash collision (~n²/2⁶⁴) can only mark one extra
  * chunk as duplicate.
  */
object ChunkDedup {

  /** Explode docs into (…other cols…, id, chunk_idx, chunk, chunk_hash).
    * The last chunk may be shorter than `width`; empty docs produce no
    * chunks. Non-text columns pass through (so e.g. an event-time column
    * survives for the streaming composition with
    * `StreamingOps.dedupStream`). */
  def chunks(docs: DataFrame, idCol: String, textCol: String, width: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val nChunks = ceil(size(col("__toks")) / lit(width.toDouble)).cast("int")
    docs
      .withColumn("__toks", toks)
      // sequence(0, -1) would count DOWN — guard the empty-doc case.
      .select(col("*"), posexplode(when(size(col("__toks")) > 0,
        transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(col("__toks"), i * width + 1, lit(width)), " ")))
        .otherwise(array().cast("array<string>"))))
      .drop("__toks", textCol)
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .withColumn("chunk_hash", xxhash64(col("chunk")))
  }

  /** Mark each chunk kept/dropped under global keep-first. Returns
    * (id, chunk_idx, chunk, is_kept). */
  def keepFirst(chunked: DataFrame, idCol: String): DataFrame = {
    // keep-first as a window over the hash exchange (r15, the
    // SubstringDedup.dupWindows move): the old min(struct) aggregate +
    // join-back ran the chunk-generation explode twice and paid the
    // join's second exchange; min(struct) over the whole partition needs
    // no ordering. Same rows, one corpus explode, one Exchange. NOTE:
    // column order differs from the old join form (which moved
    // chunk_hash first); keepFirst's contract is by-name.
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy("chunk_hash")
    chunked
      .withColumn("__first",
        min(struct(col(idCol), col("chunk_idx"))).over(byHash))
      .withColumn("is_kept",
        col("__first").getField(idCol) === col(idCol) &&
          col("__first").getField("chunk_idx") === col("chunk_idx"))
      .drop("__first")
  }

  /** Per-document survival report: (id, n_chunks, n_kept, n_dropped). */
  def survival(docs: DataFrame, idCol: String, textCol: String, width: Int): DataFrame =
    keepFirst(chunks(docs.select(idCol, textCol), idCol, textCol, width)
        .select(idCol, "chunk_idx", "chunk_hash"), idCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_chunks") - col("n_kept"))
}
