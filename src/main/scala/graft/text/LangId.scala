package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification (training-data-pipeline operator; the
  * reference routes documents by a declared language config key —
  * `deploy/configmaps/configs.yaml:10-44` — it never infers one, so this is
  * the generalized operator a 100 TB text pipeline needs).
  *
  * Method: stopword-profile scoring. For each candidate language, count
  * tokens that are members of a small high-frequency function-word set;
  * predict the argmax with a fixed tie order, `und` (undetermined) when no
  * profile matches. Pure built-in HOFs — codegen'd, no UDF — and exactly
  * reproducible in a DuckDB oracle (`list_filter` + `IN`).
  */
object LangId {

  /** Tiny function-word profiles. Deliberately small and disjoint-ish:
    * the operator contract is the scoring mechanism, not lexicon quality. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "es", "una", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
  )

  /** Per-language stopword hit count over a token array column. */
  def score(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Argmax over (label, score) columns: the first label whose score is
    * >= every later score (ties resolve in list order); `zeroLabel` when
    * every score is 0. Shared by [[predict]], [[predictCharNgram]] and
    * `NlpFunctions.topic` — it was copy-pasted three times and all three
    * copies had the same null bug. NULL scores count as 0: a null
    * input column makes size(filter(null, …)) null, every when()
    * condition null, and the cascade would fall through to the LAST
    * label — confidently classifying every null doc as the final
    * profile instead of `zeroLabel`. */
  private[graft] def argmaxCascade(scores: Seq[(String, Column)],
                                   zeroLabel: String): Column = {
    val safe = scores.map { case (l, s) => l -> coalesce(s, lit(0)) }
    val allZero = safe.map(_._2 === 0).reduce(_ && _)
    val cascade = safe.zipWithIndex.foldRight(lit(safe.last._1)) {
      case (((label, s), i), rest) =>
        val later = safe.drop(i + 1).map(_._2)
        if (later.isEmpty) rest
        else when(later.map(s >= _).reduce(_ && _), lit(label)).otherwise(rest)
    }
    when(allZero, lit(zeroLabel)).otherwise(cascade)
  }

  /** Predicted language for a token array: argmax score, ties resolved in
    * `profiles` order, `und` when every score is 0 — including for a
    * NULL token array (null scores count as zero hits). */
  def predict(toks: Column): Column =
    argmaxCascade(profiles.map { case (lang, words) =>
      lang -> score(toks, words) }, "und")

  /** Character-n-gram profiles: the most characteristic trigrams (with
    * word-boundary marks, Cavnar–Trenkle style) per language. As with
    * the word profiles, deliberately tiny — the mechanism is the
    * operator; production swaps in profiles trained on a corpus. */
  val charProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing", " of"),
    "de" -> Seq(" de", "der", "er ", "ie ", "ein", "und", "sch", "ich"),
    "es" -> Seq(" de", " la", "la ", "os ", "as ", "que", " qu", "ión"),
    "fr" -> Seq(" le", "le ", " de", "es ", "ent", " et", "eau", "oux"),
  )

  /** Char-trigram hit count: how many of the language's characteristic
    * trigrams occur in the (space-padded, lowercased) text. Uses the
    * scan-side `CharNgramHashes` kernel for the document's trigram set —
    * one pass regardless of profile count. */
  def charScore(text: Column, trigrams: Seq[String]): Column = {
    val docGrams = graft.expressions.NgramHashes.char_ngram_hashes(
      concat(lit(" "), lower(text), lit(" ")), 3)
    val profileHashes = array(trigrams.map(g =>
      lit(graft.expressions.NgramHashes.fnv1aOf(g))): _*)
    graft.expressions.SetIntersectSize.set_intersect_size(docGrams, profileHashes)
  }

  /** Char-n-gram language prediction (Cavnar–Trenkle-shaped): argmax of
    * profile-trigram hits, ties in `charProfiles` order, `und` when no
    * profile trigram occurs at all. */
  def predictCharNgram(text: Column): Column =
    argmaxCascade(charProfiles.map { case (lang, gs) =>
      lang -> charScore(text, gs) }, "und")
}
