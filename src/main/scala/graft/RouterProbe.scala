package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLSH

/** One-shot router validation: on a documents corpus, print what
  * `MinHashLSH.chooseVerifyForm` decides and TIME both verify forms to
  * completion (noop sink), so the decision can be checked against
  * measurement — the router's contract is "pick the faster physical
  * form", and this main is how that claim is re-audited after data or
  * cost-model changes (e.g. on /tmp/graft-sf3, whose salted copies make
  * a 150k-doc corpus SPARSE: the old fixed-100k-doc rule would force
  * in-band there, the histogram rule should keep the cheaper fetch).
  *
  * Usage: runMain graft.RouterProbe [sfDir] [n3|c8]
  */
object RouterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf3")
    val gram = args.lift(1).getOrElse("n3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables(spark, dir, "documents")
    val sh = gram match {
      case "c8" => d.select(col("doc_id"),
        graft.expressions.NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
      case _ => d.select(col("doc_id"),
        graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))
    }
    val threshold = if (gram == "c8") 0.7 else 0.8
    val n = sh.count()

    var t0 = System.nanoTime()
    // an explicit form list is a pure A/B — skip the routing job there
    // (at x100 the candidate count alone is a minute per rep)
    if (args.lift(2).forall(a => a == "stats" || a == "all")) {
      val choice = MinHashLSH.chooseVerifyForm(sh, "doc_id", "sh", 64, 16, 4)
      val routeSec = (System.nanoTime() - t0) / 1e9
      println(f"ROUTER corpus=$dir gram=$gram docs=$n choice=$choice route_job=${routeSec}%.2f s")
    }

    if (args.lift(2).contains("stats")) {
      // calibration quantities behind the cost model: per-band pair
      // mass (the band-0 estimator's input), the DISTINCT candidate
      // count C (what fetch actually ships 2C arrays for), and the
      // in-band shipment n×numBands — printed so the router's rule can
      // be re-derived from measurement when corpora change
      val sigs = MinHashLSH.signaturesFromHashArray(sh, "doc_id", "sh", 64)
      val rows = sigs.select(col("doc_id"),
          explode(MinHashLSH.bandKeys(col("__sig"), 16, 4)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val perBand = rows.groupBy("band", "key").agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= MinHashLSH.DefaultMaxBucket)
        .groupBy("band").agg((sum(col("sz") * (col("sz") - 1)) / 2).as("pairs"))
        .orderBy("band").collect()
      perBand.foreach(r => println(s"ROUTERSTATS band=${r.get(0)} pairs=${r.get(1)}"))
      val cDistinct = MinHashLSH.candidatePairs(sigs, "doc_id", "__sig", 16, 4).count()
      println(s"ROUTERSTATS distinctC=$cDistinct inbandShip=${n * 16} " +
        s"fetchShip=${2 * cDistinct}")
    } else {
      // optional 3rd arg: comma-list of forms to time (default all three)
      // so expensive corpora can A/B just the contenders min-of-N
      val all = Seq(MinHashLSH.VerifyForm.Fetch, MinHashLSH.VerifyForm.InBand,
        MinHashLSH.VerifyForm.InBandTwoTier)
      val picked = args.lift(2) match {
        case None | Some("all") => all
        case Some(csv) => csv.split(",").toSeq.map(n =>
          all.find(_.toString.equalsIgnoreCase(n)).getOrElse(
            sys.error(s"unknown form $n (use ${all.mkString("/")})")))
      }
      picked.foreach { form =>
        System.gc()
        t0 = System.nanoTime()
        val obs = new org.apache.spark.sql.Observation()
        MinHashLSH.nearDupPairsHashed(sh, "doc_id", "sh", 64, 16, threshold,
            verify = form)
          .observe(obs, count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
        println(f"ROUTER $form%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=${obs.get("n")}")
      }
    }
    spark.stop()
  }
}
