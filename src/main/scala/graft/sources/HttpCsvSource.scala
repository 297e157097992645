package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.HttpFetcher

/** S1 as a first-class DataSource V2: `spark.read.format("graft-http-csv")
  * .option("url", ...)` — the `FileDataSourceV2` shape SURVEY §2.1 row S1
  * names as the beyond-parity form of the reference's HTTP CSV ingest
  * (utils.py:5-8, fetch_football_data.py:57-66).
  *
  * Contract:
  *  - the BODY is fetched once, on the driver (matching the reference's
  *    driver-side network position and keeping executor counts out of any
  *    rate-limit math); executors receive line slices inside the
  *    [[LinesPartition]]s, so parsing scales out while the network stays
  *    a single client. Bodies are memoized per URL in a bounded
  *    driver-side cache — one GET per URL per JVM even when schema
  *    inference AND the scan both need it (`refresh=true` bypasses).
  *  - columns are served as STRINGS (a raw CSV is untyped; the reference
  *    types columns in `normalize`, and the engine's F1/F9 coercions are
  *    the downstream contract). A non-string user schema is rejected
  *    loudly rather than silently cast.
  *  - COLUMN PRUNING and FILTER PUSHDOWN (EqualTo / IsNotNull) are real:
  *    pruned columns are never materialized into rows, pushed filters
  *    run during line parsing, and both surface in `.explain` via
  *    [[LinesScan.description]] exactly like the built-in sources.
  *  - fetch failure: with a user schema the scan degrades to zero rows
  *    (S6 — empty-but-valid, the pipeline completes); during schema
  *    inference it throws (no header, no contract — same split as
  *    `Sources.tolerantCsv` vs `fetchOrEmpty`).
  *
  * The rate-limited S4 endpoints (fetch_fbr_team_xg.py:86-88) stay on the
  * sequential driver-side [[graft.sources.Sources.Fetcher]] API by design:
  * a DSv2 scan may be re-planned/re-executed, which must never multiply
  * paced requests.
  */
final class HttpCsvSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-http-csv"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpCsvSource.headerSchema(
      HttpCsvSource.fetchBody(options).getOrElse(throw new IllegalArgumentException(
        s"graft-http-csv: cannot infer schema, fetch failed for url=${options.get("url")}")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    require(schema.fields.forall(_.dataType == StringType),
      "graft-http-csv serves raw CSV as string columns; cast downstream (F1/F9)")
    new HttpCsvTable(schema, new CaseInsensitiveStringMap(properties))
  }
}

object HttpCsvSource {

  /** Driver-side body memo (url → body), bounded; `refresh=true` bypasses.
    * DSv2 calls fetch during schema inference and again when planning
    * partitions — the memo keeps that at one GET per URL per JVM.
    */
  private val bodyCache = new util.concurrent.ConcurrentHashMap[String, String]()

  /** One shared client: connection reuse, and per-instance pacing state
    * that actually accumulates (a per-fetch HttpFetcher would make both
    * meaningless).
    */
  private lazy val fetcher = new HttpFetcher()

  private[graft] def fetchBody(options: CaseInsensitiveStringMap): Option[String] = {
    val url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-http-csv: missing required option 'url'"))
    val refresh = options.getBoolean("refresh", false)
    if (!refresh) {
      // single get, not containsKey-then-get: a concurrent clear() between
      // the two would surface as Some(null)
      val cached = bodyCache.get(url)
      if (cached != null) return Some(cached)
    }
    val body: Option[String] =
      if (url.startsWith("http://") || url.startsWith("https://"))
        fetcher.get(url, timeoutSec = options.getInt("timeoutSec", 60))
      else {
        val p = java.nio.file.Paths.get(url.stripPrefix("file://"))
        if (java.nio.file.Files.exists(p))
          Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        else None
      }
    body.foreach { b =>
      if (bodyCache.size > 16) bodyCache.clear()
      bodyCache.put(url, b)
    }
    body
  }

  private[graft] def headerSchema(body: String): StructType = {
    val header = splitRecords(body).headOption.getOrElse(
      throw new IllegalArgumentException("graft-http-csv: empty body, no header"))
    StructType(parseCsvLine(header).map(c =>
      org.apache.spark.sql.types.StructField(
        Option(c).getOrElse(""), StringType, nullable = true)))
  }

  /** Split the body into CSV RECORDS, not lines: a newline inside a quoted
    * field (RFC-4180 §2.6) is field content, so records are delimited only
    * by newlines at quote depth zero. CRLF terminators are normalized;
    * empty records (blank lines between rows) are skipped.
    */
  private[graft] def splitRecords(body: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inQuotes = false
    var i = 0
    def flush(): Unit = {
      val rec =
        if (cur.length > 0 && cur.charAt(cur.length - 1) == '\r')
          cur.substring(0, cur.length - 1)
        else cur.toString
      if (rec.nonEmpty) out += rec
      cur.setLength(0)
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '"') { inQuotes = !inQuotes; cur.append(c) }
      else if (c == '\n' && !inQuotes) flush()
      else cur.append(c)
      i += 1
    }
    flush()
    out.toArray
  }

  /** Minimal RFC-4180 field split: double quotes delimit fields that may
    * contain commas, `""` escapes a quote inside a quoted field. Unquoted
    * empty fields parse as null (Spark CSV's default nullValue); quoted
    * empty fields parse as "".
    */
  private[graft] def parseCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inQuotes = false
    var wasQuoted = false
    var i = 0
    def flush(): Unit = {
      out += (if (cur.length == 0 && !wasQuoted) null else cur.toString)
      cur.setLength(0); wasQuoted = false
    }
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else c match {
        case '"' => inQuotes = true; wasQuoted = true
        case ',' => flush()
        case _   => cur.append(c)
      }
      i += 1
    }
    flush()
    out.toArray
  }
}

final class HttpCsvTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"graft-http-csv(${options.get("url")})"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new LinesScanBuilder(tableSchema, options)
}

final class LinesScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept exactly what the reader enforces exactly; everything else is
    // returned so Spark keeps a post-scan Filter for it
    val (ok, rest) = filters.partition {
      case EqualTo(a, _: String) => full.fieldNames.contains(a)
      case IsNotNull(a)          => full.fieldNames.contains(a)
      case _                     => false
    }
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new LinesScan(full, required, pushed, options)
}

final class LinesScan(full: StructType, required: StructType,
                      pushed: Array[Filter], options: CaseInsensitiveStringMap)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-http-csv url=${options.get("url")} " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val body = HttpCsvSource.fetchBody(options)
    val dataLines: Array[String] = body match {
      case None    => Array.empty // S6: fetch failed → empty-but-valid scan
      case Some(b) => HttpCsvSource.splitRecords(b).drop(1) // drop header
    }
    val n = math.max(1, math.min(options.getInt("numPartitions", 4),
      math.max(1, dataLines.length)))
    dataLines.grouped(math.ceil(dataLines.length.toDouble / n).toInt.max(1))
      .map(ls => LinesPartition(ls): InputPartition).toArray match {
        case empty if empty.isEmpty => Array(LinesPartition(Array.empty))
        case parts                  => parts
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LinesReaderFactory(full, required, pushed)
}

/** Serialized to executors: the slice of data lines this partition parses. */
final case class LinesPartition(lines: Array[String]) extends InputPartition

final class LinesReaderFactory(full: StructType, required: StructType,
                               pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LinesReader(partition.asInstanceOf[LinesPartition].lines, full, required, pushed)
}

final class LinesReader(lines: Array[String], full: StructType,
                        required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val fullIdx = full.fieldNames.zipWithIndex.toMap
  private val outIdx: Array[Int] = required.fieldNames.map(fullIdx)
  // (full-row index, expected value or null-means-IsNotNull) per filter
  private val checks: Array[(Int, String)] = pushed.map {
    case EqualTo(a, v: String) => (fullIdx(a), v)
    case IsNotNull(a)          => (fullIdx(a), null)
    case f => throw new IllegalStateException(s"unpushable filter leaked: $f")
  }

  private var i = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (i < lines.length) {
      val raw = HttpCsvSource.parseCsvLine(lines(i))
      i += 1
      // short rows pad with null (the reference's tolerant posture);
      // long rows keep the declared width
      val row = Array.tabulate(full.length)(j => if (j < raw.length) raw(j) else null)
      val pass = checks.forall { case (idx, expect) =>
        val v = row(idx)
        if (expect == null) v != null else v != null && v == expect
      }
      if (pass) {
        current = new GenericInternalRow(
          outIdx.map(j => UTF8String.fromString(row(j)): Any))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}
