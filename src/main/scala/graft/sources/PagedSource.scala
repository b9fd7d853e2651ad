package graft.sources

import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 re-expression of the reference's paginated API scans
  * (SURVEY S1/S8: Newsfilter `from`/`size` pages
  * `/root/reference/src/lurkers/newsfilter.py:111-151`, EastMoney
  * `pageSize=100` pages `eastmoney.py:63-96`): each page is one
  * `InputPartition`, so page fetches run in parallel across executors
  * and the driver never materializes the corpus.
  *
  * The connector implements BOTH DSv2 pushdown hooks the survey's §4
  * optimizer table calls for:
  *  - `SupportsPushDownFilters`: `=`, `<`, `<=`, `>`, `>=` on `id` are
  *    evaluated inside the page reader (the analog of shipping a time
  *    range into an API query string); anything else stays a residual
  *    Spark filter.
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    materialized per row.
  *
  * Pages live as JSON-lines files `page-*.jsonl` under `path` (the
  * fixture stand-in for HTTP fetches — swap the reader's iterator for a
  * paged GET in production; the planning/pushdown shape is identical).
  * Schema is fixed: (id bigint, page int, title string).
  *
  * Usage: `spark.read.format("graft.sources.PagedSource")
  *   .option("path", dir).load()`.
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PagedTable(properties.get("path"))
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true)))

  /** Minimal JSONL field extraction for the fixture format
    * {"id":N,"title":"..."} — not a general JSON parser. None for a line
    * with no parseable id: the id column is declared non-nullable, and a
    * fabricated sentinel (the old id = -1) would pass pushed predicates
    * like LessThan(id, 10) and pollute results — malformed lines are
    * DROPPED, not invented. */
  private[sources] def parseLine(line: String, page: Int): Option[(Long, Int, String)] = {
    val idM = "\"id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(line)
    val tM = "\"title\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(line)
    idM.map(m => (m.group(1).toLong, page, tM.map(_.group(1)).orNull))
  }
}

class PagedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged($path)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path)
}

class PagedScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedSource.schema

  /** Accept id comparisons; everything else is Spark's problem. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PagedScan(path, pushed, required)
}

case class PagePartition(file: String, page: Int) extends InputPartition

class PagedScan(path: String, filters: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedScan(path=$path, pushed=${filters.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // page listing happens on the driver (like reading total pages, A7);
    // the page CONTENTS are read inside the partitions
    require(path != null, "PagedSource requires a 'path' option")
    val dir = new java.io.File(path)
    // listFiles returns NULL (not empty) for a missing or non-directory
    // path — surface a clear planning error instead of an NPE in sortBy
    val files = dir.listFiles((_, n) => n.startsWith("page-") && n.endsWith(".jsonl"))
    require(files != null, s"PagedSource path is not a readable directory: $path")
    files.sortBy(_.getName)
      .zipWithIndex
      .map { case (f, i) => PagePartition(f.getAbsolutePath, i): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(filters, required)
}

class PagedReaderFactory(filters: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PagedReader(p, filters, required)
  }
}

class PagedReader(p: PagePartition, filters: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[(Long, Int, String)] = {
    val src = scala.io.Source.fromFile(p.file, "UTF-8")
    val parsed = new ArrayBuffer[(Long, Int, String)]
    try src.getLines().filter(_.trim.nonEmpty)
      .foreach(l => PagedSource.parseLine(l, p.page).foreach(parsed += _))
    finally src.close()
    parsed.iterator.filter(r => passes(r._1))
  }

  private def passes(id: Long): Boolean = filters.forall {
    case EqualTo("id", v: Long) => id == v
    case GreaterThan("id", v: Long) => id > v
    case GreaterThanOrEqual("id", v: Long) => id >= v
    case LessThan("id", v: Long) => id < v
    case LessThanOrEqual("id", v: Long) => id <= v
    case _ => true
  }

  private var current: (Long, Int, String) = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = {
    val values = required.fields.map(_.name).map {
      case "id" => current._1.asInstanceOf[Any]
      case "page" => current._2.asInstanceOf[Any]
      case "title" =>
        (if (current._3 == null) null else UTF8String.fromString(current._3)).asInstanceOf[Any]
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
