package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLSH

/** Scratch probe for the round's physical-form experiments (contents
  * change per experiment; the committed state documents the latest).
  *
  * Current: q35 ×100 structure probe — candidate-pair mass with and
  * without the exact-safe SIZE-RATIO prefilter (jaccard(A,B) <=
  * min(|A|,|B|)/max(|A|,|B|), so min/max < t proves the pair fails the
  * threshold before any array ships), plus exact-fingerprint group
  * structure (docs with IDENTICAL hash sets are jaccard-1 cliques and
  * interchangeable w.r.t. every third doc).
  *
  * Mode `q23forms`: time q23's two equivalent majority-vote physical
  * forms (relational two-hash-agg vs the typed `majorityFullAgg`
  * Aggregator) under full materialization — the ×100 decision record
  * the sf0.1 measurement in q23's scaladoc extrapolates from.
  *
  * Usage: runMain graft.ScratchForms [sfDir] [c8|n3|q23forms]
  */
object ScratchForms {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10")
    val gram = args.lift(1).getOrElse("c8")
    if (gram == "q23forms") { q23Forms(dir); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "192"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables(spark, dir, "documents")
    val threshold = if (gram == "c8") 0.7 else 0.8
    val sh = (gram match {
      case "c8" => d.select(col("doc_id"),
        graft.expressions.NgramHashes.char_ngram_hashes(col("text"), 8).as("sh"))
      case _ => d.select(col("doc_id"),
        graft.expressions.NgramHashes.word_ngram_hashes(col("text"), 3).as("sh"))
    }).localCheckpoint()

    val n = sh.count()
    println(s"PROBE corpus=$dir gram=$gram docs=$n threshold=$threshold")

    // exact-fingerprint structure: identical hash SETS
    val fp = sh.select(col("doc_id"), size(col("sh")).as("nsz"),
      xxhash64(concat_ws(",", transform(array_sort(col("sh")), x => x.cast("string")))).as("fp"))
    val groups = fp.groupBy("fp").agg(count(lit(1)).as("g")).localCheckpoint()
    val stats = groups.agg(count(lit(1)).as("n_groups"),
      sum(when(col("g") > 1, col("g")).otherwise(0L)).as("docs_in_dup_groups"),
      max(col("g")).as("max_group"),
      sum(col("g") * (col("g") - 1) / 2).as("intra_pairs")).head()
    println(s"PROBE fingerprint groups=${stats.get(0)} docsInDupGroups=${stats.get(1)} maxGroup=${stats.get(2)} intraPairs=${stats.get(3)}")

    // candidate mass, with and without the size-ratio prefilter
    val sigs = MinHashLSH.signaturesFromHashArray(sh, "doc_id", "sh", 64)
      .join(fp.select(col("doc_id"), col("nsz")), "doc_id")
    val rows = sigs.select(col("doc_id"), col("nsz"),
        explode(MinHashLSH.bandKeys(col("__sig"), 16, 4)).as("bk"))
      .select(col("doc_id"), col("nsz"), col("bk.band").as("band"), col("bk.key").as("key"))
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
      .filter(col("__bsz") <= MinHashLSH.DefaultMaxBucket).drop("__bsz")
      .localCheckpoint()
    val l = rows.select(col("doc_id").as("a"), col("nsz").as("na"), col("band"), col("key"))
    val r = rows.select(col("doc_id").as("b"), col("nsz").as("nb"), col("band"), col("key"))
    val joined = l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
    val agg = joined.agg(count(lit(1)).as("collisions"),
      sum(when(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")), 1L).otherwise(0L)).as("collisionsSizeOk")).head()
    println(s"PROBE bandCollisions=${agg.get(0)} afterSizeFilter=${agg.get(1)}")
    val c = joined.select("a", "b").distinct().count()
    val cSize = joined
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")))
      .select("a", "b").distinct().count()
    println(s"PROBE distinctC=$c afterSizeFilterC=$cSize inbandShip=${n * 16}")
    spark.stop()
  }

  private def q23Forms(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "192"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.enrich.SectorVote
    def pairs = Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"FORM $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    pairs.count() // warm file listing/footers
    time("relationalTwoAgg") {
      SectorVote.majority(pairs, "l_orderkey", "p_brand")
    }
    time("typedFullAgg") {
      import spark.implicits._
      pairs.as[(Long, String)].groupByKey(_._1)
        .mapValues(_._2)
        .agg(SectorVote.majorityFullAgg().toColumn.name("v"))
        .select(col("key").as("l_orderkey"), col("v.majority"),
          col("v.cnt"), col("v.total"))
    }
    spark.stop()
  }
}
