package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain inner join (incl. a hot key and an unmatched key)") {
    val fact = (Seq.fill(500)(("AAPL", 1)) ++ Seq(("TSLA", 2), ("NOPE", 3)))
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("row_id", "ticker", "v")
    val dim = Seq(("AAPL", 4510L), ("TSLA", 4010L), ("MSFT", 4520L))
      .toDF("ticker", "icb_code")
    val plain = fact.join(dim, "ticker")
      .select("row_id", "ticker", "v", "icb_code")
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    val salted = SaltedJoin.join(fact, dim, "ticker", numSalts = 8,
        saltOn = hash(col("row_id")))
      .select("row_id", "ticker", "v", "icb_code")
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    assert(plain.length == 501) // NOPE drops, hot key keeps all 500
    assert(salted.sameElements(plain))
  }

  test("hot key actually spreads across salts") {
    val fact = Seq.tabulate(64)(i => (i.toLong, "HOT")).toDF("row_id", "k")
    val dim = Seq(("HOT", 1)).toDF("k", "x")
    val salts = fact.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .select(countDistinct("__salt")).as[Long].collect()(0)
    assert(salts > 4) // 64 rows over 8 salts: all-in-one is (1/8)^63-unlikely
    assert(SaltedJoin.join(fact, dim, "k", 8, hash(col("row_id"))).count() == 64)
  }

  test("auto routes by probe but never changes results") {
    val fact = (Seq.fill(50)(("AAPL", 1)) ++
      Seq(("TSLA", 2), ("MSFT", 3), ("NOPE", 4)))
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("row_id", "ticker", "v")
    val dim = Seq(("AAPL", 4510L), ("TSLA", 4010L), ("MSFT", 4520L))
      .toDF("ticker", "icb_code")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "ticker", "v", "icb_code")
        .as[(Long, String, Int, Long)].collect().sortBy(_._1).toSeq
    val want = rows(fact.join(dim, "ticker"))
    val salt = hash(col("row_id"))
    // each threshold setting forces a different physical route
    val viaBroadcast = SaltedJoin.auto(fact, dim, "ticker", salt,
      broadcastMaxRows = 10) // 3 ≤ 10 → broadcast
    val viaSalted = SaltedJoin.auto(fact, dim, "ticker", salt,
      broadcastMaxRows = 0, hotKeyShare = 0.2) // AAPL share ≈ 0.94
    val viaPlain = SaltedJoin.auto(fact, dim, "ticker", salt,
      broadcastMaxRows = 0, hotKeyShare = 0.99)
    assert(rows(viaBroadcast) == want)
    assert(rows(viaSalted) == want)
    assert(rows(viaPlain) == want)
    // the salted route really salted (its plan joins on the salt too)
    assert(viaSalted.queryExecution.analyzed.toString.contains("__salt"))
    assert(!viaPlain.queryExecution.analyzed.toString.contains("__salt"))
  }
}
