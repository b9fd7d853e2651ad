package graft.sinks

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** K5: index lifecycle management, re-expressed for partitioned parquet
  * tables. The reference's ES ILM policies
  * (`/root/reference/src/utils/elasticsearch_settings.md:5-66`) do three
  * things; each has a first-class Spark-native analog:
  *
  *  - **rollover** at max_age=7d / max_size=5gb → date-partitioned
  *    layout (a partition IS a rolled-over segment) + [[needsRollover]]
  *    as the writer's decision function for when to cut a new one;
  *  - **forcemerge** to 1 segment → [[Sinks.compact]] (small-file
  *    rewrite toward a target file size);
  *  - **delete** at min_age (1088d news / 85d tweets) →
  *    [[dropExpiredPartitions]]: partition-level directory deletes, the
  *    exact cost profile ES buys with ILM — retention is a METADATA
  *    operation on partitions, never a scan-and-filter rewrite of the
  *    table (at 100 TB a rewrite-retention is a nightly full-table job;
  *    a partition drop is O(partitions)).
  *
  * The policy itself is recorded next to the data ([[writePolicy]] /
  * [[readPolicy]] sidecar — the TBLPROPERTIES analog for path-based
  * tables; a cataloged deployment would `ALTER TABLE … SET
  * TBLPROPERTIES` the same pairs), so the retention job is driven by
  * table-attached metadata, not hardcoded constants — mirroring how the
  * reference attaches the policy to the index template, with per-table
  * ages (news vs tweets).
  */
object Retention {

  /** The ES ILM triple, as data. Ages in days; size in bytes. */
  case class Policy(rolloverMaxAgeDays: Int, rolloverMaxBytes: Long,
                    deleteMinAgeDays: Int)

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sessionState.newHadoopConf()))
  }

  /** ILM delete phase: drop `partitionCol=<date>` partition directories
    * strictly older than `minAgeDays` before `today`. Returns the
    * dropped partition values (the audit record a retention job logs).
    * Unparseable partition values are left untouched — retention must
    * never guess. */
  def dropExpiredPartitions(spark: SparkSession, path: String,
                            partitionCol: String, minAgeDays: Int,
                            today: LocalDate): Seq[String] = {
    val (root, f) = fs(spark, path)
    if (!f.exists(root)) return Nil
    val cutoff = today.minusDays(minAgeDays.toLong)
    val prefix = partitionCol + "="
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap { st =>
        val value = st.getPath.getName.stripPrefix(prefix)
        val expired =
          try LocalDate.parse(value).isBefore(cutoff)
          catch { case _: java.time.format.DateTimeParseException => false }
        if (expired && f.delete(st.getPath, true)) Some(value) else None
      }
      .sorted
  }

  /** ILM rollover decision for the current hot partition: cut a new one
    * when it is older than `maxAgeDays` or larger than `maxBytes` —
    * exactly the reference's `max_age`/`max_size` pair. Pure metadata
    * (one content summary), no scan. */
  def needsRollover(spark: SparkSession, hotPartitionPath: String,
                    policy: Policy, partitionDate: LocalDate,
                    today: LocalDate): Boolean = {
    val (p, f) = fs(spark, hotPartitionPath)
    if (!f.exists(p)) return false
    val tooOld = !partitionDate.plusDays(policy.rolloverMaxAgeDays.toLong)
      .isAfter(today)
    lazy val tooBig = f.getContentSummary(p).getLength > policy.rolloverMaxBytes
    tooOld || tooBig
  }

  /** Record the policy next to the table (TBLPROPERTIES analog for
    * path-based tables). One tiny JSON sidecar; idempotent overwrite. */
  def writePolicy(spark: SparkSession, path: String, policy: Policy): Unit = {
    val (root, f) = fs(spark, path)
    val sidecar = new org.apache.hadoop.fs.Path(root, "_retention_policy.json")
    val out = f.create(sidecar, true)
    try out.write(
      s"""{"rollover_max_age_days":${policy.rolloverMaxAgeDays},"rollover_max_bytes":${policy.rolloverMaxBytes},"delete_min_age_days":${policy.deleteMinAgeDays}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the table's recorded policy; None when the table carries no
    * sidecar (caller falls back to a fleet default). */
  def readPolicy(spark: SparkSession, path: String): Option[Policy] = {
    val (root, f) = fs(spark, path)
    val sidecar = new org.apache.hadoop.fs.Path(root, "_retention_policy.json")
    if (!f.exists(sidecar)) return None
    val in = f.open(sidecar)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def long(k: String): Long =
      ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(text)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(
          s"malformed retention sidecar at $sidecar: $text"))
    Some(Policy(long("rollover_max_age_days").toInt,
      long("rollover_max_bytes"), long("delete_min_age_days").toInt))
  }

  /** The standing maintenance pass, end-to-end: read the table's policy,
    * drop expired partitions, report. (Compaction/forcemerge runs on its
    * own cadence via [[Sinks.compact]].) */
  def applyPolicy(spark: SparkSession, path: String, partitionCol: String,
                  today: LocalDate): Seq[String] =
    readPolicy(spark, path) match {
      case Some(p) =>
        dropExpiredPartitions(spark, path, partitionCol, p.deleteMinAgeDays, today)
      case None => Nil
    }
}
