package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Sessionize

/** Sessionize hot-key BREAKING-POINT probe (round-13 verdict #3): the
  * Zipf rehearsal left the per-key ordered window as the only shape
  * paying for skew (+42% at ×100 under a 14% key, bounded, zero spill).
  * This main pushes past that regime — planted hot keys owning 25%, 50%,
  * 90% of all events at the given scale — and A/Bs the three forms:
  *
  *   - plain:   `Sessionize.keyStats(Form.Plain)` — one window task
  *              sorts the whole hot key;
  *   - sharded: `Form.Sharded` with the Auto width (span/256);
  *   - auto:    `Form.Auto` — the shipped router, whose per-key count
  *              pass must pick the winner and whose total cost is the
  *              thing the routing threshold justifies.
  *
  * Derivation: events are read from an already-scaled dir and the hot
  * key is PLANTED (seeded hash draw over event_id → key 0), leaving
  * volume, timestamps, and the rest of the key mass untouched — so the
  * A/B isolates the hot key's share. Corpora are written once per
  * fraction and reused (delete the dir to rebuild). Run it twice and
  * read the second set of numbers (min-of-2 discipline; the first run
  * pays page-cache warmup for the freshly-written corpus).
  *
  * Usage: runMain graft.SessionizeSkewProbe [srcDir] [frac,frac,...]
  *        (defaults /tmp/graft-sf10, 0.25,0.5,0.9)
  */
object SessionizeSkewProbe {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft-sf10")
    val fracs = args.lift(1).getOrElse("0.25,0.5,0.9")
      .split(",").toSeq.map(_.toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sessionize-skew")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val GapUs = 21600000000L // the q128 contract: 6 h

    def corpusFor(frac: Double): String = {
      // frac 0 = the UNSKEWED common case (round-14 verdict #3): read the
      // source events as-is and A/B plain vs auto to price Auto's routing
      // pass when the answer is "stay plain".
      if (frac <= 0) return src
      val out = s"/tmp/graft-hotkey-${(frac * 100).round}"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/events.parquet/_SUCCESS"))) {
        val ev = Tables(spark, src, "events")
          .withColumn("user_id",
            when(ZipfCorpus.uniformOf(col("event_id")) < frac, lit(0L))
              .otherwise(col("user_id")))
        ev.repartition(64).write.mode("overwrite").parquet(s"$out/events.parquet")
        println(s"PROBE built $out (hot frac $frac)")
      }
      out
    }

    SparkEntry.entry(spark).collect() // warmup

    val probe = try Bench.probeSec(spark) catch { case _: Exception => -1.0 }
    println(f"PROBE session probe=$probe%.3f s index=${probe / Bench.NominalProbeSec}%.2f")

    def events(dir: String) = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))

    val thunks = fracs.flatMap { frac =>
      val dir = corpusFor(frac)
      Seq(
        f"plain-${(frac * 100).round}%02d" -> (() =>
          Sessionize.keyStats(events(dir), "user_id", "us", GapUs,
            Sessionize.Form.Plain)),
        f"sharded-${(frac * 100).round}%02d" -> (() => {
          val r = events(dir).agg(min("us"), max("us")).head()
          val span = math.max(1L, r.getLong(1) - r.getLong(0))
          Sessionize.keyStats(events(dir), "user_id", "us", GapUs,
            Sessionize.Form.Sharded(math.max(1L, span / Sessionize.AutoShardTarget)))
        }),
        f"auto-${(frac * 100).round}%02d" -> (() =>
          Sessionize.keyStats(events(dir), "user_id", "us", GapUs,
            Sessionize.Form.Auto)))
    }
    def gb(b: Long): String = f"${b / 1024.0 / 1024 / 1024}%7.2f"
    println(f"${"form"}%-12s ${"sec"}%8s ${"shufW GiB"}%9s ${"spill GiB"}%9s ${"peakTask GiB"}%12s ${"tasks"}%7s rows")
    ScaleRehearsal.measureThunks(spark, thunks).foreach {
      case ScaleRehearsal.QM(name, sec, _, _, _, _, _, _, Some(err)) =>
        println(f"$name%-12s $sec%8.2f FAILED: $err")
      case ScaleRehearsal.QM(name, sec, _, sw, sp, pk, tasks, rows, None) =>
        println(f"$name%-12s $sec%8.2f ${gb(sw)}%9s ${gb(sp)}%9s ${gb(pk)}%12s $tasks%7d $rows")
    }
    spark.stop()
  }
}
