package graft.schema

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The unified document row (SURVEY.md §1.2). The reference declares a
  * dataclass hierarchy (`/root/reference/src/res/models/datamodels.py:5-46`)
  * with per-lurker extensions; our engine uses one superset schema with
  * nullable per-source fields — `Dataset[Doc]` where type safety helps,
  * `DataFrame` elsewhere.
  *
  * Multi-valued/nested columns per the reference: `tickers` array
  * (one article → many tickers), `keywords` array<struct> (EastMoney
  * `eastmoney.py:195`), `props` map for raw per-source API fields
  * (`eastmoney.py:16-22` `info: dict`).
  */
case class Keyword(word: String, score: Double)

case class Doc(
    unique_identifier: String,
    source_id: String,
    text_hash: String,
    source: String,
    title: Option[String],
    text: Option[String],
    tickers: Seq[String],
    sentiment: Option[Double],
    sector_code: Option[Int],
    source_link: Option[String],
    time: java.sql.Timestamp,
    retrieval_time: java.sql.Timestamp,
    just_insert: Boolean,
    keywords: Seq[Keyword],
    props: Map[String, String])

object Doc {
  implicit val encoder: Encoder[Doc] = Encoders.product[Doc]
  val schema: StructType = encoder.schema

  /** O18 doc assembly: build the typed struct from extracted columns with
    * the reference's defaults (`datamodels.py:43-46`) — except the clock,
    * which is injected for determinism (`datetime.now()` defaults are one
    * of the reference's reproducibility bugs, SURVEY §7.4).
    *
    * `textHash` is the PRECOMPUTED content hash (TextOps.textHashHex over
    * the same get_text rendering the dedup gates keyed on) — threading it
    * through instead of re-hashing here both saves a second md5 per doc
    * and makes it structurally impossible for the stored hash to drift
    * from the hash dedup ran against. Note the hash is deliberately over
    * the RENDERED text (title and body joined by get_text, nulls
    * skipped): that is the reference's dedup identity — two posts whose
    * rendered text coincides ARE duplicates under its contract, even if
    * the title/body split differs. */
  def assemble(
      id: Column, source: Column, title: Column, text: Column,
      tickers: Column, time: Column, sourceLink: Column,
      retrievalTime: Column, textHash: Column): Column =
    struct(
      id.cast("string").as("unique_identifier"),
      id.cast("string").as("source_id"),
      textHash.as("text_hash"),
      source.as("source"),
      title.as("title"),
      text.as("text"),
      tickers.as("tickers"),
      lit(null).cast("double").as("sentiment"),
      lit(null).cast("int").as("sector_code"),
      sourceLink.as("source_link"),
      time.as("time"),
      retrievalTime.as("retrieval_time"),
      lit(true).as("just_insert"),
      lit(null).cast("array<struct<word:string,score:double>>").as("keywords"),
      lit(null).cast("map<string,string>").as("props"))
}
