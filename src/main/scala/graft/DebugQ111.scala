package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugQ111 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables(spark, dir, "events")
    val daily = ev.groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("day_value"))
    val xq = col("day").cast("double").cast("decimal(18,6)")
    val yq = col("day_value").cast("double").cast("decimal(18,6)")
    val agg = daily.filter(col("event_type") === "signup")
      .agg(count(lit(1)).as("n"),
        sum(xq).as("sx"), sum(yq).as("sy"), sum(xq * yq).as("sxy"),
        sum(xq * xq).as("sxx"), sum(yq * yq).as("syy"))
    agg.collect().foreach { r =>
      println(s"n=${r.get(0)} sx=${r.get(1)} sy=${r.get(2)} sxy=${r.get(3)} sxx=${r.get(4)} syy=${r.get(5)}")
      val n = r.getLong(0).toDouble
      val Seq(sx, sy, sxy, sxx, syy) =
        (1 to 5).map(i => r.getDecimal(i).doubleValue())
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icpt = (sy - slope * sx) / n
      println(f"double sx=$sx%.17g sy=$sy%.17g sxy=$sxy%.17g sxx=$sxx%.17g")
      println(f"slope=$slope%.17g icpt=$icpt%.17g")
    }
    spark.stop()
  }
}
