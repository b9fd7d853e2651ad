package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAuditSpec extends SparkSpec {
  import spark.implicits._

  test("flags a celebrity key") {
    // 9 keys with 10 rows, 1 key with 910 → mean 100, max 910
    val rows = (0 until 9).flatMap(k => Seq.fill(10)(s"k$k")) ++
      Seq.fill(910)("hot")
    val r = SkewAudit.audit(rows.toDF("k"), col("k")).collect().head
    assert(r.getAs[Long]("n_keys") === 10L)
    assert(r.getAs[Long]("n_rows") === 1000L)
    assert(r.getAs[Long]("max_cnt") === 910L)
    assert(r.getAs[Double]("skew_ratio") === 9.1)
    assert(r.getAs[Double]("top_key_share") === 0.91)
    assert(r.getAs[Double]("p50_cnt") === 10.0)
  }

  test("uniform keys audit flat") {
    val rows = (0 until 50).flatMap(k => Seq.fill(4)(k))
    val r = SkewAudit.audit(rows.toDF("k"), col("k")).collect().head
    assert(r.getAs[Double]("skew_ratio") === 1.0)
    assert(r.getAs[Double]("p50_cnt") === 4.0 &&
      r.getAs[Double]("p99_cnt") === 4.0)
  }
}
