package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The cent-unit revenue sums' overflow contract (round-14 verdict #5):
  * the long-arithmetic form (`RelationalQueries.cents` — `round(v·100)
  * .cast(long)`, products in cent·cent units) is documented as "fails
  * LOUDLY via ANSI overflow at ~×1000 scale, never a silent wrap".
  * This spec asserts both halves of that boundary on an engineered
  * corpus run through the REAL q02 query path:
  *
  *  - sums just UNDER 2⁶³ in cent·cent units → exact answer;
  *  - sums past 2⁶³ → SparkArithmeticException (ANSI long-sum
  *    overflow), NOT a wrapped/negative/wrong number.
  *
  * Per-row terms: ep = 1e15 → cents(ep) = 10¹⁷ (exactly double-
  * representable: 5¹⁷·2¹⁷), disc = 0.05 → cents = 5, product 5e17.
  * 18 rows → 9.0e18 < 2⁶³−1 ≈ 9.223e18; 19 rows → 9.5e18 > 2⁶³. */
class CentUnitOverflowSpec extends SparkSpec {

  private def lineitem(nRows: Int): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-centunit").toString
    val ship = Timestamp.valueOf("1996-06-01 00:00:00")
    val rows = (1 to nRows).map { i =>
      (i.toLong, i.toLong, i.toLong, i, 10.0, 1e15, 0.05, 0.0, "N", "O", ship)
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def revenue(dir: String): DataFrame =
    RelationalQueries.q02FilteredRevenue(spark, dir)

  test("cent-unit sum just under 2^63 is exact") {
    val dir = lineitem(18) // 18 · 5e17 = 9.0e18 cent·cent units
    val got = revenue(dir).head().getDouble(0)
    // 9.0e18 / 1e4 = 9.0e14 — exactly representable, exactly expected
    assert(got == 9.0e14, s"expected 9.0e14, got $got")
  }

  test("cent-unit sum past 2^63 fails loudly with ANSI overflow") {
    val dir = lineitem(19) // 19 · 5e17 = 9.5e18 > Long.MaxValue
    // local-mode task failure surfaces as SparkException with the ANSI
    // SparkArithmeticException (an ArithmeticException) in the chain
    val e = intercept[Exception] { revenue(dir).head() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the cause chain, got: " +
        chain(e).map(_.getClass.getSimpleName).mkString(" <- "))
  }
}
