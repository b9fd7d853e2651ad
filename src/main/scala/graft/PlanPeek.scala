package graft
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"===== $name =====")
      // "lsh:<Fetch|InBand|InBandTwoTier>" explains the near-dup pair
      // miner with a FORCED verify form (the registered q35 routes by
      // corpus, so the big-corpus in-band plans are invisible at small
      // SFs); anything else is a SparkEntry query name.
      if (name.startsWith("lsh:")) {
        import org.apache.spark.sql.functions._
        val form = name.stripPrefix("lsh:") match {
          case "Fetch" => graft.dedup.MinHashLSH.VerifyForm.Fetch
          case "InBand" => graft.dedup.MinHashLSH.VerifyForm.InBand
          case "InBandTwoTier" => graft.dedup.MinHashLSH.VerifyForm.InBandTwoTier
          case other => sys.error(s"unknown form $other")
        }
        val sh = Tables(spark, dir, "documents").select(col("doc_id"),
          graft.expressions.NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
        graft.dedup.MinHashLSH.nearDupPairsHashed(sh, "doc_id", "sh",
          64, 16, 0.7, verify = form).explain("formatted")
      } else if (name == "substrdup") {
        // q91's dup-window miner: invisible in the final plan behind
        // report()'s localCheckpoint
        import org.apache.spark.sql.functions._
        graft.dedup.SubstringDedup.dupWindows(
          Tables(spark, dir, "documents"), "doc_id", "text", width = 10)
          .explain("formatted")
      } else if (name == "starround") {
        // the connected-components star loop body (q92): invisible in the
        // final plan because every round sits behind a localCheckpoint
        import org.apache.spark.sql.functions._
        val sh = Tables(spark, dir, "documents").select(col("doc_id"),
          graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))
        val pairs = graft.dedup.MinHashLSH.nearDupPairsHashed(sh, "doc_id", "sh",
          64, 16, 0.8).select(col("doc_a").as("u"), col("doc_b").as("v"))
        graft.dedup.Clusters.starRound(pairs).explain("formatted")
      } else SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
