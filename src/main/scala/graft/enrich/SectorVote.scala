package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sector classification by ticker vote (SURVEY.md A1/A2,
  * `/root/reference/src/utils/general_utils.py:126-184`).
  *
  * A1 `get_sector`: count the sectors of a document's tickers; return the
  * mode iff its share exceeds a threshold (reference: 2/3), else null.
  * Reference tie-breaking (`Counter.most_common`) is insertion-ordered —
  * non-deterministic for our purposes — so we *define*: highest count
  * first, then smallest sector value.
  *
  * A2 `get_sector_loose`: same vote at threshold 1/2, but when no level-8
  * ICB majority exists, trim two digits (8→6→4→2) and retry — a rollup
  * along the ICB hierarchy. One base aggregation produces per-(doc, code)
  * counts; each coarser level re-aggregates that already-tiny result, and
  * winner selection is a window over doc_id — high-cardinality partitions,
  * scale-safe (never a window over raw rows).
  */
object SectorVote {

  /** A1: majority vote. `pairs` has one row per (doc, sector) occurrence.
    * Returns (docCol, winnerCol, cnt, total) with winnerCol null when the
    * top sector's share does not exceed num/denom. */
  def majority(pairs: DataFrame, docCol: String, sectorCol: String,
               num: Int = 2, denom: Int = 3): DataFrame = {
    val counts = pairs.groupBy(docCol, sectorCol).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(docCol)
    val ranked = counts
      .withColumn("total", sum("cnt").over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("cnt").desc, col(sectorCol).asc)))
    ranked.filter(col("rn") === 1)
      .select(col(docCol),
        when(col("cnt") * denom > col("total") * num, col(sectorCol))
          .otherwise(lit(null)).as("majority"),
        col("cnt"), col("total"))
  }

  /** A2: hierarchical vote over a numeric code hierarchy. `divisors` lists
    * the trim divisors finest-first (ICB: 1, 100, 10000, 1000000); the
    * first level whose winner clears num/denom supplies the result.
    * Returns (docCol, sector, level) where level is the divisor's index in
    * `divisors` as a string label, null when no level has a majority. */
  def hierarchical(pairs: DataFrame, docCol: String, codeCol: String,
                   divisors: Seq[Long] = Seq(1L, 100L, 10000L, 1000000L),
                   levelLabels: Seq[String] = Seq("8", "6", "4", "2"),
                   num: Int = 1, denom: Int = 2): DataFrame = {
    require(divisors.length == levelLabels.length)
    val base = pairs.groupBy(col(docCol), col(codeCol).cast("long").as("code"))
      .agg(count(lit(1)).as("cnt"))
    val total = base.groupBy(docCol).agg(sum("cnt").as("total"))
    val winners = divisors.zipWithIndex.map { case (d, i) =>
      val lvl = base
        .groupBy(col(docCol), (col("code") / d).cast("long").as("lvl_code"))
        .agg(sum("cnt").as("lcnt"))
      val w = Window.partitionBy(docCol)
        .orderBy(col("lcnt").desc, col("lvl_code").asc)
      lvl.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col(docCol), col("lvl_code").as(s"w$i"), col("lcnt").as(s"c$i"))
    }
    val joined = winners.foldLeft(total)((acc, win) => acc.join(win, Seq(docCol), "left"))
    val sector = coalesce(divisors.indices.map { i =>
      when(col(s"c$i") * denom > col("total") * num, col(s"w$i"))
    }: _*)
    val level = coalesce(divisors.indices.map { i =>
      when(col(s"c$i") * denom > col("total") * num, lit(levelLabels(i)))
    }: _*)
    joined.select(col(docCol), sector.as("sector"), level.as("level"))
  }
}
