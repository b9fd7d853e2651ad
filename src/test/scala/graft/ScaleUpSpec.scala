package graft

import org.apache.spark.sql.functions._

/** The scale-rehearsal dataset builder is only useful if the scaled data
  * preserves the structural properties the queries' cost model depends
  * on. Pins, on a ×3 build of sf0.001:
  *
  *  - linear growth with single-copy dims (region/nation unchanged);
  *  - referential integrity: zero orphan foreign keys after remapping,
  *    and per-key join cardinality preserved (no cross-copy fan-out);
  *  - document copies are NOT near-duplicates of their original (the salt
  *    keeps 3-shingle Jaccard far below every dedup threshold), so the
  *    near-dup family scales linearly instead of in copy-cliques;
  *  - embedding copies keep their norm bit-exactly (rotation) while
  *    decorrelating from the original.
  */
class ScaleUpSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-spec").toString
    ScaleUp.build(spark, src, dir, copies = 3, quiet = true)
    dir
  }

  test("row counts scale linearly; dims stay single-copy") {
    def n(dir: String, t: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(n(out, t) === 3 * n(src, t), t)
    for (t <- Seq("region", "nation"))
      assert(n(out, t) === n(src, t), t)
  }

  test("referential integrity: no orphans, per-key cardinality preserved") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val p = spark.read.parquet(s"$out/part.parquet")
    val s = spark.read.parquet(s"$out/supplier.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count() === 0)
    assert(li.join(p, li("l_partkey") === p("p_partkey"), "left_anti").count() === 0)
    assert(li.join(s, li("l_suppkey") === s("s_suppkey"), "left_anti").count() === 0)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() === 0)
    // max lines per order unchanged → joins fan out linearly, never ×copies
    def maxPerKey(df: org.apache.spark.sql.DataFrame, k: String): Long =
      df.groupBy(col(k)).count().agg(max("count")).head.getLong(0)
    assert(maxPerKey(li, "l_orderkey") ===
      maxPerKey(spark.read.parquet(s"$src/lineitem.parquet"), "l_orderkey"))
  }

  test("document copies are not near-duplicates of the original") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val dS = 1000L // stride for sf0.001 doc ids (max 499 → next power of 10)
    val grams = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(split(text,' ')) - 3),
          |  k -> concat_ws(' ', slice(split(text,' '), k + 1, 3)))""".stripMargin))
        .as("gram")).distinct()
    val orig = grams.filter(col("doc_id") < dS)
    val copy = grams.filter(col("doc_id") >= dS && col("doc_id") < 2 * dS)
      .withColumn("doc_id", col("doc_id") - dS)
    // distinct-trigram intersection via equi-join on (doc_id, gram)
    val inter = orig.join(copy, Seq("doc_id", "gram"))
      .groupBy("doc_id").agg(count("*").as("inter"))
    val na = orig.groupBy("doc_id").agg(count("*").as("na"))
    val nb = copy.groupBy("doc_id").agg(count("*").as("nb"))
    val jac = na.join(nb, "doc_id")
      .join(inter, Seq("doc_id"), "left")
      .na.fill(0, Seq("inter"))
      .select(col("doc_id"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
    assert(jac.count() > 0)
    val maxJ = jac.agg(max("j")).head.getDouble(0)
    assert(maxJ < 0.5, s"copy still near-dup: max Jaccard $maxJ")
  }

  test("embedding copies: norm preserved bit-exactly, correlation broken") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val vS = 1000L // vec_id max 499 at sf0.001 → stride 1000
    val withNorm = emb.withColumn("norm",
      aggregate(col("embedding"), lit(0.0d), (acc, x) => acc + x * x))
    val orig = withNorm.filter(col("vec_id") < vS)
      .select(col("vec_id").as("base"), col("embedding").as("e0"), col("norm").as("n0"))
    val copy = withNorm.filter(col("vec_id") >= vS && col("vec_id") < 2 * vS)
      .select((col("vec_id") - vS).as("base"), col("embedding").as("e1"), col("norm").as("n1"))
    val joined = orig.join(copy, "base")
      .withColumn("dot", aggregate(zip_with(col("e0"), col("e1"), _ * _),
        lit(0.0d), _ + _))
      .withColumn("cos", col("dot") / sqrt(col("n0") * col("n1")))
    assert(joined.filter(col("n0") =!= col("n1")).count() === 0)
    val worst = joined.agg(max(abs(col("cos")))).head.getDouble(0)
    assert(worst < 0.9, s"rotated copy still correlated: max |cos| $worst")
  }

  test("copy-invariant aggregates scale exactly linearly") {
    // the rehearsal's implicit correctness model: a query grouping on a
    // copy-invariant column over the scaled build must see counts and
    // decimal sums EXACTLY ×copies (copies differ only in keys/salt),
    // and averages bit-identical — so a scaled-run result that drifts
    // from this is a wrong answer, not a tuning artifact
    def byFlag(dir: String) = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,12)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    val a = byFlag(src); val b = byFlag(out)
    assert(a.keySet == b.keySet)
    for ((k, (n, s)) <- a) {
      assert(b(k)._1 === 3 * n, s"count($k)")
      assert(b(k)._2 === s.multiply(new java.math.BigDecimal(3)), s"sum($k)")
    }
  }

  test("span mode: events copies shift to contiguous months, density preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-span").toString
    ScaleUp.build(spark, src, dir, copies = 3, quiet = true, eventsSpan = true)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val evSrc = Tables(spark, src, "events")
    assert(ev.count() === 3 * evSrc.count())
    // copy i occupies [i*30d, i*30d + original span); ranges must not overlap
    def range(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(min("ts"), max("ts")).head
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }
    val (lo, hi) = range(evSrc)
    val spanMs = 30L * 24 * 3600 * 1000
    // same stride rule as the builder: next power of ten above max id
    val maxId = evSrc.agg(max("event_id")).head.getLong(0)
    val stride = Iterator.iterate(1L)(_ * 10).dropWhile(_ <= maxId).next()
    for (i <- 0 until 3) {
      val (clo, chi) = range(ev.filter(
        col("event_id") >= i * stride && col("event_id") < i * stride + maxId + 1))
      assert(clo === lo + i * spanMs, s"copy $i min")
      assert(chi === hi + i * spanMs, s"copy $i max")
    }
    // per-day density equals the source's (shifted, not compressed)
    val perDaySrc = evSrc.groupBy(to_date(col("ts")).as("d")).count()
      .agg(max("count")).head.getLong(0)
    val perDay = ev.groupBy(to_date(col("ts")).as("d")).count()
      .agg(max("count")).head.getLong(0)
    assert(perDay === perDaySrc)
  }

  test("embedding copies past the dim count decorrelate via sign-flips") {
    // copies > dims wrap the rotation: copy 64 has rot 0 (same as the
    // original) and copy 65 rot 1 (same as copy 1) — without the
    // popcount sign-flip mask they would be bit-identical duplicates
    // and the ANN/dedup families would form copy-cliques at ×100.
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-wrap").toString
    ScaleUp.build(spark, src, dir, copies = 66, quiet = true)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vS = 1000L
    def slot(i: Long) = emb
      .filter(col("vec_id") >= i * vS && col("vec_id") < (i + 1) * vS)
      .select((col("vec_id") - i * vS).as("base"), col("embedding").as(s"e$i"),
        aggregate(col("embedding"), lit(0.0d), (acc, x) => acc + x * x).as(s"n$i"))
    def maxAbsCos(a: Long, b: Long): Double = slot(a).join(slot(b), "base")
      .withColumn("dot", aggregate(zip_with(col(s"e$a"), col(s"e$b"), _ * _),
        lit(0.0d), _ + _))
      .agg(max(abs(col("dot") / sqrt(col(s"n$a") * col(s"n$b"))))).head.getDouble(0)
    // wrapped copies vs their rotation-twin, and the two wrap generations
    assert(maxAbsCos(0L, 64L) < 0.9, "copy 64 duplicates the original")
    assert(maxAbsCos(1L, 65L) < 0.9, "copy 65 duplicates copy 1")
    // norms stay bit-exact through the flips
    val n0 = slot(0L).select(col("base"), col("n0"))
    val n64 = slot(64L).select(col("base"), col("n64"))
    assert(n0.join(n64, "base").filter(col("n0") =!= col("n64")).count() === 0)
  }
}
