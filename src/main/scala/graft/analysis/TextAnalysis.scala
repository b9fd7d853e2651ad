package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Corpus text-analysis operators for an LLM training-data pipeline:
  * token statistics, quality scoring, and document fingerprinting. All
  * built-in-function composition (codegen'd, per-row, no shuffle), designed
  * to run inside the scan stage at 100 TB.
  *
  * The reference's analogs are its per-row text gates
  * (`/root/reference/src/utils/general_utils.py:187-206`) and the external
  * NLU calls (SURVEY.md N1–N10) whose signatures we reproduce locally.
  */
object TextAnalysis {

  /** Whitespace/punct/alpha composition counts used by quality scoring. */
  def charLen(text: Column): Column = length(text)
  def alphaCount(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", ""))
  def digitCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", ""))
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** Sum of token lengths (for mean-token-length stats). */
  def tokenCharSum(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** BPE-ish subword segmentation: the GPT-2-style pre-tokenizer regex
    * (contraction suffixes | space?-letters | space?-digits |
    * space?-punct runs | whitespace runs) — the standard proxy for "how
    * many tokens will the tokenizer emit" without a merges table. RE2-
    * compatible (no lookarounds), so a DuckDB oracle matches exactly. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Heuristic quality score in [0,1]: long-enough, mostly-alpha, low-punct
    * text scores high. Deterministic arithmetic, oracle-reproducible. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = TextOps.tokens(text)
    val n = size(toks).cast("double")
    val lenScore = least(n / lit(100.0), lit(1.0))
    val alphaRatio = alphaCount(text).cast("double") /
      greatest(charLen(text).cast("double"), lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(charLen(text).cast("double"), lit(1.0))
    val stopRatio = size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(n, lit(1.0))
    round(lit(0.25) * lenScore + lit(0.35) * alphaRatio +
      lit(0.25) * (lit(1.0) - least(punctRatio * 5, lit(1.0))) +
      lit(0.15) * least(stopRatio * 5, lit(1.0)), 6)
  }

  /** Polynomial rolling-hash fingerprint over the token stream:
    * fp = fold(tokens, 0, (acc, t) -> (acc*31 + md5Int32(t)) mod 2^31-1).
    * Order-sensitive (unlike a bag-of-words hash) so token reordering
    * changes the fingerprint; cross-engine stable via md5Int32. */
  def fingerprint(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => TextOps.md5Int32(t))
    aggregate(hashes, lit(0L), (acc, h) => pmod(acc * 31 + h, lit(2147483647L)))
  }

  /** Cross-document n-gram novelty: per doc, the fraction of its DISTINCT
    * word n-grams not present in any lower-id document — the corpus-level
    * repetition signal next to the within-doc one (`qualityScore` /
    * repetition fractions): boilerplate already emitted upstream scores
    * near 0 even when each copy is internally clean.
    *
    * Scale shape: grams shuffle as 60-bit md5 longs (never shingle
    * strings); first-sighting is one min-aggregation on a well-distributed
    * high-cardinality key, joined back postings-side, then one per-doc
    * aggregation. Returns (idCol, n_grams, n_novel, novelty). */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(TextOps.wordShingles(col("__toks"), n)).as("__gram"))
      .select(col(idCol), TextOps.md5Int60(col("__gram")).as("__g"))
    val firstSeen = grams.groupBy("__g").agg(min(col(idCol)).as("__first"))
    grams.join(firstSeen, Seq("__g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_grams"), 4))
  }
}
