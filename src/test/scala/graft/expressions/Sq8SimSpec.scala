package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Sq8SimSpec extends SparkSpec {
  import spark.implicits._

  // The declarative double-fold spelling of the same arithmetic — the
  // shape the DuckDB oracle mirrors (list_inner_product over the
  // reconstructed list). Kernel parity with THIS proves the kernel's
  // fold order and association match the oracle's.
  private val hofMirror =
    """aggregate(
         sequence(1, size(vec)),
         CAST(0.0 AS DOUBLE),
         (acc, i) -> acc + (CAST(element_at(qvec, i) AS DOUBLE) * (
           element_at(mn, i) + CASE
             WHEN element_at(mx, i) = element_at(mn, i) THEN CAST(0.0 AS DOUBLE)
             ELSE (round(((CAST(element_at(vec, i) AS DOUBLE) - element_at(mn, i))
                    / (element_at(mx, i) - element_at(mn, i))) * 255.0)
                  * (element_at(mx, i) - element_at(mn, i))) / 255.0
           END)))"""

  test("kernel is bit-identical to the declarative double-fold mirror") {
    val rows = (1 to 200).map { i =>
      val q = Array.tabulate(16)(d => ((i * 31 + d * 7) % 97 - 48) / 13.0f)
      val v = Array.tabulate(16)(d => ((i * 17 + d * 11) % 89 - 44) / 11.0f)
      val mn = Array.fill(16)(-4.5)
      val mx = Array.tabulate(16)(d => if (d == 3) -4.5 else 4.5) // one zero-span dim
      (q, v, mn, mx)
    }
    val df = rows.toDF("qvec", "vec", "mn", "mx")
      .withColumn("kern", Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")))
      .withColumn("mirror", expr(hofMirror))
    val bad = df.filter(col("kern") =!= col("mirror")).count()
    assert(bad == 0)
  }

  test("half-up rounding at an exact .5 code boundary") {
    // span 255, x = 127.5: scaled = ((127.5/255))*255 = 127.5 exactly
    // (dyadic), half-up -> code 128 -> recon 128.0
    val df = Seq((Array(1.0), Array(127.5), Array(0.0), Array(255.0)))
      .toDF("qvec", "vec", "mn", "mx")
      .select(Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")).as("s"))
    assert(df.collect()(0).getDouble(0) == 128.0)
  }

  test("code-boundary sweep: kernel matches Spark's round() at every edge") {
    // x values a few ulps around each k+0.5 code boundary (span 255, so
    // scaled ≈ x): the kernel's frac>=0.5 rounding must agree with the
    // mirror's authoritative SQL round() (decimal HALF_UP) on all of
    // them — this is where a floor(v+0.5)-style kernel would diverge.
    def ulps(x: Double, n: Int): Double =
      java.lang.Double.longBitsToDouble(java.lang.Double.doubleToLongBits(x) + n)
    val rows = for {
      k <- Seq(0, 1, 63, 127, 200, 254)
      b <- -3 to 3
    } yield {
      val x = ulps(k + 0.5, b)
      (Array(1.0), Array(x), Array(0.0), Array(255.0))
    }
    val df = rows.toDF("qvec", "vec", "mn", "mx")
      .withColumn("kern", Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")))
      .withColumn("mirror", expr(hofMirror))
    assert(df.filter(col("kern") =!= col("mirror")).count() == 0)
  }

  test("short query/bounds arrays return null (no out-of-bounds read)") {
    // fold length is size(vec); a 2-dim query against a 3-dim vec (or a
    // short mn/mx) must yield null — the HOF mirror's element_at past the
    // end poisoned the fold with null, and UnsafeArrayData getters have
    // no bounds checks, so the kernel must length-guard explicitly.
    val rows = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0), Array(4.0, 4.0, 4.0)),
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0), Array(4.0, 4.0, 4.0)),
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0), Array(4.0, 4.0)))
    val df = rows.toDF("qvec", "vec", "mn", "mx")
      .select(Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")).as("s"))
    assert(df.collect().forall(_.isNullAt(0)))
    // LONGER query/bounds than vec stays defined (fold is over vec)
    val longer = Seq((Array(1.0, 1.0, 9.0), Array(127.5, 4.0), Array(0.0, 0.0, 0.0),
        Array(255.0, 255.0, 255.0)))
      .toDF("qvec", "vec", "mn", "mx")
      .select(Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")).as("s"))
    assert(longer.collect()(0).getDouble(0) == 132.0)
  }

  test("null element and zero-span handling") {
    val withNull = Seq((Array[java.lang.Double](1.0, null), Array(1.0, 2.0),
        Array(0.0, 0.0), Array(4.0, 4.0)))
      .toDF("qvec", "vec", "mn", "mx")
      .select(Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")).as("s"))
    assert(withNull.collect()(0).isNullAt(0))
    // zero-span -> recon = mn exactly
    val zs = Seq((Array(2.0), Array(123.0), Array(7.0), Array(7.0)))
      .toDF("qvec", "vec", "mn", "mx")
      .select(Sq8Sim.sq8_sim(col("qvec"), col("vec"), col("mn"), col("mx")).as("s"))
    assert(zs.collect()(0).getDouble(0) == 14.0)
  }
}
