package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{LangId, TextOps}
import graft.analysis.TextAnalysis

/** Text-operator coverage over the `documents` table (SURVEY.md §2.3
  * O1–O17 + the training-data-pipeline text-analysis operators). Every
  * query is per-row built-in-function composition followed by one
  * aggregation — scan-stage work that scales linearly, no extra shuffles.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Token statistics per language: tokenization (O7's split), distinct
    * counts, mean token length. */
  val q12TokenStats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val toks = TextOps.tokens(col("text"))
    d.select(col("lang"),
        size(toks).as("n_toks"),
        size(array_distinct(toks)).as("n_distinct"),
        TextAnalysis.tokenCharSum(toks).as("tok_chars"),
        length(col("text")).as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_toks"), 4).as("avg_tokens"),
        round(avg("n_distinct"), 4).as("avg_distinct"),
        round(sum("tok_chars").cast("double") / sum("n_toks"), 4).as("avg_token_len"),
        sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** Cleanup chain (O7 scrub → O4 punct collapse → O5 normalize) + the
    * min-length gate (F10), with a per-row deterministic hash (O2) so the
    * oracle verifies every byte of the cleaned text. */
  val q13TextClean: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val cleaned = TextOps.normalizeWhitespace(
      TextOps.collapsePunctRuns(TextOps.scrubText(col("text")), Seq("!", "?", ",", ";")))
    d.select(col("doc_id"), cleaned.as("clean"))
      .filter(TextOps.minWordGate(col("clean")))
      .select(col("doc_id"), md5(col("clean")).as("clean_hash"),
        TextOps.wordCount(col("clean")).as("n_words"))
      .orderBy("doc_id")
  }

  /** Term extraction (O16's regexp_extract_all shape) + explode + grouped
    * tallies with a distinct-doc count (A3/A4). */
  val q14TermExtract: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"), col("lang"),
        explode(regexp_extract_all(col("text"),
          lit("\\b(key|hash|join|scan|merge|filter)\\b"), lit(0))).as("term"))
      .groupBy("term", "lang")
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("term", "lang")
  }

  /** Language-ID heuristic: stopword-profile argmax vs the declared lang —
    * a confusion-matrix-shaped output. */
  val q15LangProfile: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val toks = TextOps.tokens(col("text"))
    d.select(col("lang"), LangId.predict(toks).as("pred"),
        LangId.score(toks, LangId.profiles.head._2).as("en_hits"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("en_hits"), 4).as("avg_en_hits"))
      .orderBy("lang", "pred")
  }

  /** Per-document rolling-hash fingerprint + quality score — order-
    * sensitive content identity and filter scoring for corpus curation. */
  val q16Fingerprint: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.qualityScore(col("text"), LangId.profiles.head._2).as("quality"))
      .orderBy("doc_id")
  }

  /** BPE-ish token accounting per doc (training-data budgeting): GPT-2
    * pre-tokenizer regex segments vs whitespace words. */
  val q36BpeTokens: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        TextOps.wordCount(col("text")).as("n_words"))
      .withColumn("ratio", round(col("n_bpe").cast("double") /
        greatest(col("n_words").cast("double"), lit(1.0)), 4))
      .orderBy("doc_id")
  }

  /** Deterministic hash-bucket corpus split (train/valid/test): the
    * content-keyed sampling a training pipeline uses so splits are stable
    * under re-runs, shard order, and incremental arrivals — pure
    * scan-side filter work, no shuffle, any scale. Same md5-derived
    * bucket as the DuckDB oracle (O2's cross-engine hash). */
  val q40HashSplit: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val bucket = pmod(TextOps.md5Int32(col("text")), lit(100))
    d.select(col("doc_id"), bucket.as("bucket"),
        when(bucket < 80, lit("train"))
          .when(bucket < 90, lit("valid"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  /** Corpus length distribution per source: exact interpolated
    * percentiles (p50/p90/p99) of document length — the stats pass that
    * sizes batches and truncation budgets. At 100 TB swap `percentile`
    * for `approx_percentile` (t-digest sketch, one pass, mergeable);
    * exact here so the oracle can verify value-for-value. */
  val q41QuantileStats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(percentile(col("n_chars"), lit(0.5)), 4).as("p50"),
        round(percentile(col("n_chars"), lit(0.9)), 4).as("p90"),
        round(percentile(col("n_chars"), lit(0.99)), 4).as("p99"))
      .orderBy("source")
  }

  /** Sequence packing for training batches: assign each document to a
    * fixed-token-budget sequence by prefix-sum position within its
    * (source, lang) shard — `seq_idx = floor(tokens_before / budget)`.
    * The shard key is what makes the cumulative window scale-safe: the
    * window never spans more than one shard, and packing is inherently
    * sequential only WITHIN a shard (shard count grows with the corpus,
    * so parallelism does too). */
  val q42TokenPacking: Q = (s, dir) => {
    val budget = 512.0
    val d = Tables(s, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.select(col("doc_id"), col("source"), col("lang"),
        TextOps.wordCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget)).as("seq_idx"))
      .orderBy("doc_id")
  }

  /** Repetition-based quality filters (the Gopher-style heuristics for
    * machine-generated/boilerplate text): fraction of the document taken
    * by its single most frequent token, and the duplicate-2-gram
    * fraction. The top-token pass is explode + two codegen'd hash aggs
    * (never a per-row O(n²) fold); the 2-gram distinct count reuses the
    * scan-side `word_ngram_hashes` kernel. */
  val q45Repetition: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val tokCounts = d
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(max("cnt").as("top_cnt"), sum("cnt").as("n_toks"))
    val grams = d.select(col("doc_id"),
      size(graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 2)).as("n_distinct_2g"),
      greatest(TextOps.wordCount(col("text")) - 1, lit(1)).as("n_2g"))
    tokCounts.join(grams, "doc_id")
      .select(col("doc_id"),
        round(col("top_cnt").cast("double") / col("n_toks"), 4).as("top_tok_frac"),
        round(lit(1.0) - col("n_distinct_2g").cast("double") / col("n_2g"), 4).as("dup_2gram_frac"))
      .withColumn("quality_pass",
        col("top_tok_frac") < 0.15 && col("dup_2gram_frac") < 0.6)
      .orderBy("doc_id")
  }

  /** End-to-end curation FUNNEL: raw → cleaned+length-gated → exact-
    * deduped, with per-source survival counts — the composition a
    * pipeline owner actually monitors. Chains O7/O4/O5 clean, F10 gate,
    * O2 hash, and keeper dedup (min-doc per hash via min_by) in ONE
    * declarative plan: Catalyst shares the scan, and each stage's
    * counts are map-side partial aggregations. */
  val q46Funnel: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val cleaned = TextOps.normalizeWhitespace(
      TextOps.collapsePunctRuns(TextOps.scrubText(col("text")), Seq("!", "?", ",", ";")))
    val base = d.select(col("doc_id"), col("source"), cleaned.as("clean"))
    val gated = base.filter(TextOps.minWordGate(col("clean")))
    val kept = graft.dedup.ExactDedup.keepers(
      graft.dedup.ExactDedup.withTextHash(gated, "clean"),
      "text_hash", "doc_id", carryCols = Seq("source"))
    val raw = d.groupBy("source").agg(count(lit(1)).as("n_raw"))
    val gatedCounts = gated.groupBy("source").agg(count(lit(1)).as("n_gated"))
    val keptCounts = kept.groupBy("source").agg(count(lit(1)).as("n_kept"))
    raw.join(gatedCounts, Seq("source"), "left")
      .join(keptCounts, Seq("source"), "left")
      .select(col("source"), col("n_raw"),
        coalesce(col("n_gated"), lit(0L)).as("n_gated"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Stratified deterministic sampling: rebalance the corpus by keeping
    * a per-language fraction (downsample the dominant language, keep the
    * rest) via the same content-keyed md5 bucket as q40 — rerun-stable,
    * no RNG, scan-side filter only. The shape of `df.stat.sampleBy`,
    * made reproducible and oracle-checkable. */
  val q47StratifiedSample: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val bucket = pmod(TextOps.md5Int32(col("text")), lit(100))
    val keepBelow = when(col("lang") === "en", lit(30)).otherwise(lit(80))
    d.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < keepBelow)
      .orderBy("doc_id")
  }

  /** PER-LANGUAGE TOKENIZER FERTILITY — corpus-level tokens-per-word by
    * language (q36's per-doc ratio rolled up on the lang column): THE
    * multilingual cost-planning metric — a language whose fertility runs
    * 2–3× English pays that factor in context length, training compute
    * and serving cost, which is why tokenizer evaluations report it
    * (e.g. the XLM-R and NLLB tokenizer analyses). One scan, map-side
    * combined; exact integer sums, one rounded division at the end. */
  val q169LangFertility: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(col("lang"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        TextOps.wordCount(col("text")).as("n_w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe").cast("long")).as("n_tokens"),
        sum(col("n_w").cast("long")).as("n_words"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 4))
      .orderBy("lang")
  }

  val defs: Map[String, Q] = Map(
    "q169_lang_fertility" -> q169LangFertility,
    "q42_token_packing" -> q42TokenPacking,
    "q45_repetition" -> q45Repetition,
    "q46_funnel" -> q46Funnel,
    "q47_stratified_sample" -> q47StratifiedSample,
    "q12_token_stats" -> q12TokenStats,
    "q36_bpe_tokens" -> q36BpeTokens,
    "q13_text_clean" -> q13TextClean,
    "q14_term_extract" -> q14TermExtract,
    "q15_lang_profile" -> q15LangProfile,
    "q16_fingerprint" -> q16Fingerprint,
    "q40_hash_split" -> q40HashSplit,
    "q41_quantile_stats" -> q41QuantileStats,
  )

  // DuckDB notes: regexp_* is RE2 with per-call 'g' flag needed for
  // replace-all; list_filter/list_transform/list_reduce mirror Spark HOFs;
  // ('0x'||substr(md5(x),1,8))::BIGINT mirrors TextOps.md5Int32.
  val oracles: Map[String, String] = Map(
    "q169_lang_fertility" ->
      """WITH t AS (SELECT lang,
             len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS n_bpe,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS n_w
           FROM documents)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
           CAST(sum(n_w) AS BIGINT) AS n_words,
           round(CAST(sum(n_bpe) AS DOUBLE)
             / greatest(CAST(sum(n_w) AS BIGINT), 1), 4) AS fertility
         FROM t GROUP BY 1 ORDER BY 1""",
    "q36_bpe_tokens" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS INT) AS n_bpe,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS INT) AS n_words,
           round(CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS DOUBLE)
             / greatest(CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS DOUBLE), 1.0), 4) AS ratio
         FROM documents ORDER BY doc_id""",
    "q12_token_stats" ->
      """WITH t AS (
           SELECT lang,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n_chars
           FROM documents),
         s AS (SELECT lang, len(toks) AS n_toks, len(list_distinct(toks)) AS n_distinct,
                 list_sum(list_transform(toks, x -> len(x))) AS tok_chars, n_chars FROM t)
         SELECT lang, count(*) AS n_docs,
           round(avg(n_toks), 4) AS avg_tokens,
           round(avg(n_distinct), 4) AS avg_distinct,
           round(CAST(sum(tok_chars) AS DOUBLE) / sum(n_toks), 4) AS avg_token_len,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM s GROUP BY 1 ORDER BY 1""",
    "q13_text_clean" ->
      """WITH c AS (
           SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, 'https?://[^\s]+', '', 'g'),
                         '\$[a-zA-Z]+', '', 'g'),
                       '\!{2,}', '!', 'g'),
                     '\?{2,}', '?', 'g'),
                   '\,{2,}', ',', 'g'),
                 '\;{2,}', ';', 'g'),
               '\s+', ' ', 'g')) AS clean
           FROM documents)
         SELECT doc_id, md5(clean) AS clean_hash,
           len(list_filter(string_split_regex(trim(clean), '\s+'), x -> len(x) > 0)) AS n_words
         FROM c
         WHERE len(list_filter(string_split_regex(trim(clean), '\s+'), x -> len(x) > 0)) > 5
         ORDER BY doc_id""",
    "q14_term_extract" ->
      """SELECT term, lang, count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, lang,
                 unnest(regexp_extract_all(text, '\b(key|hash|join|scan|merge|filter)\b')) AS term
               FROM documents) t
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q15_lang_profile" ->
      """WITH t AS (SELECT lang,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sc AS (SELECT lang,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS s_en,
           len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS s_de,
           len(list_filter(toks, x -> x IN ('el','los','las','es','una','que'))) AS s_es,
           len(list_filter(toks, x -> x IN ('le','les','et','est','une','dans'))) AS s_fr
          FROM t)
         SELECT lang,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred,
           count(*) AS n_docs, round(avg(s_en), 4) AS avg_en_hits
         FROM sc GROUP BY 1, 2 ORDER BY 1, 2""",
    "q16_fingerprint" ->
      """WITH t AS (SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         h AS (SELECT doc_id, text, toks,
             list_transform(toks, w -> CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)) AS hs
           FROM t)
         SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                       (a, b) -> (a * 31 + b) % 2147483647) AS fp,
           round(0.25 * least(len(toks) / 100.0, 1.0)
               + 0.35 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                         / greatest(CAST(len(text) AS DOUBLE), 1.0))
               + 0.25 * (1.0 - least((CAST(len(text) - len(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
                         / greatest(CAST(len(text) AS DOUBLE), 1.0)) * 5, 1.0))
               + 0.15 * least((CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                         / greatest(CAST(len(toks) AS DOUBLE), 1.0)) * 5, 1.0), 6) AS quality
         FROM h ORDER BY doc_id""",
    "q40_hash_split" ->
      """SELECT doc_id,
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket,
           CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q41_quantile_stats" ->
      """SELECT source, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q42_token_packing" ->
      """WITH t AS (SELECT doc_id, source, lang,
             len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source, lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT doc_id, source, lang, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_idx
         FROM c ORDER BY doc_id""",
    "q45_repetition" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         tc AS (SELECT doc_id, tok, count(*) AS cnt
                FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
         top AS (SELECT doc_id, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n_toks
                 FROM tc GROUP BY 1),
         g AS (SELECT doc_id,
             len(CASE WHEN len(toks) >= 2
                 THEN list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])
                 ELSE [array_to_string(toks, ' ')] END) AS n_distinct_2g,
             greatest(len(toks) - 1, 1) AS n_2g
           FROM t)
         SELECT top.doc_id,
           round(CAST(top.top_cnt AS DOUBLE) / top.n_toks, 4) AS top_tok_frac,
           round(1.0 - CAST(g.n_distinct_2g AS DOUBLE) / g.n_2g, 4) AS dup_2gram_frac,
           (round(CAST(top.top_cnt AS DOUBLE) / top.n_toks, 4) < 0.15
            AND round(1.0 - CAST(g.n_distinct_2g AS DOUBLE) / g.n_2g, 4) < 0.6) AS quality_pass
         FROM top JOIN g USING (doc_id) ORDER BY doc_id""",
    "q46_funnel" ->
      """WITH c AS (
           SELECT doc_id, source,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, 'https?://[^\s]+', '', 'g'),
                         '\$[a-zA-Z]+', '', 'g'),
                       '\!{2,}', '!', 'g'),
                     '\?{2,}', '?', 'g'),
                   '\,{2,}', ',', 'g'),
                 '\;{2,}', ';', 'g'),
               '\s+', ' ', 'g')) AS clean
           FROM documents),
         g AS (SELECT doc_id, source, clean FROM c
               WHERE len(list_filter(string_split_regex(trim(clean), '\s+'), x -> len(x) > 0)) > 5),
         k AS (SELECT md5(clean) AS h, min(doc_id) AS doc_id,
                 arg_min(source, doc_id) AS source
               FROM g GROUP BY 1),
         raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY 1),
         gg AS (SELECT source, count(*) AS n_gated FROM g GROUP BY 1),
         kk AS (SELECT source, count(*) AS n_kept FROM k GROUP BY 1)
         SELECT raw.source, raw.n_raw,
           coalesce(gg.n_gated, 0) AS n_gated,
           coalesce(kk.n_kept, 0) AS n_kept
         FROM raw
         LEFT JOIN gg USING (source)
         LEFT JOIN kk USING (source)
         ORDER BY source""",
    "q47_stratified_sample" ->
      """SELECT doc_id, lang,
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
         FROM documents
         WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100
               < CASE WHEN lang = 'en' THEN 30 ELSE 80 END
         ORDER BY doc_id""",
  )
}
