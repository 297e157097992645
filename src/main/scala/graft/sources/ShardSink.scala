package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Training-shard export as a DataSource V2 WRITE path:
  * `df.write.format("graft-shards").option("path", dir).save()` — the
  * write-side complement of [[HttpCsvSource]], so the engine's connector
  * surface covers both directions of DSv2.
  *
  * Each input partition streams to ONE shard file of JSON lines (the
  * interchange a tokenizer/trainer ingests), written executor-side with
  * a real two-phase commit:
  *
  *  - tasks write to `<path>/_tmp/<uuid>.jsonl` and report the temp file
  *    plus row count in their commit message — nothing is visible
  *    mid-job, and speculative/retried tasks each write their own uuid
  *    so the LAST committed attempt wins without clobbering;
  *  - driver commit renames every temp file to
  *    `<path>/shard-<runId>-<k>-<rows>.jsonl` — the per-job runId makes
  *    names collision-free ACROSS jobs, so an append can never clobber
  *    a previously committed shard — then writes `_INDEX.json` covering
  *    the FULL dataset (prior surviving shards merged in on append);
  *  - commit ordering: new shards in → index written → (overwrite only)
  *    old shards deleted. Index-driven readers therefore see the
  *    dataset all-or-nothing at every failure point; glob readers
  *    (`shard-*.jsonl`) can transiently see old+new together if the
  *    driver dies mid-overwrite-commit — over-inclusive, never partial
  *    loss of the committed generation;
  *  - abort deletes the temp files; a crashed job leaves only `_tmp`
  *    debris, never a half-visible dataset.
  *
  * Local-filesystem rename semantics match the single-node harness; on
  * an object store the rename step becomes a copy-manifest commit, same
  * protocol shape.
  */
final class ShardSink extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-shards"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-shards is write-only; read shards back with spark.read.json")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShardTable(schema, new CaseInsensitiveStringMap(properties))
}

final class ShardTable(writeSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {

  override def name(): String = s"graft-shards(${options.get("path")})"

  override def schema(): StructType = writeSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ShardWriteBuilder(info.schema(),
      Option(info.options.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-shards: missing option 'path'")))
}

final class ShardWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ShardBatchWrite(schema, path, doTruncate)
  }
}

final case class ShardCommit(tmpPath: String, rows: Long) extends WriterCommitMessage

final class ShardBatchWrite(schema: StructType, path: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardWriterFactory(schema, path)

  /** Files.list streams hold an open DirectoryStream — they MUST be
    * closed, or every commit leaks a directory fd until GC.
    */
  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally s.close()
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val oldShards = listDir(dir).map(_.getFileName.toString)
      .filter(n => n.startsWith("shard-") && n.endsWith(".jsonl"))
    val runId = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val shards = messages.collect { case ShardCommit(tmp, rows) => (tmp, rows) }
    // 1. new shards in — runId makes the names unique across jobs, so no
    //    previously committed file can be clobbered, append or not
    val newNames = shards.zipWithIndex.map { case ((tmp, rows), k) =>
      val name = s"shard-$runId-$k-$rows.jsonl"
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dir.resolve(name))
      (name, rows)
    }
    // 2. index covers the FULL post-commit dataset (prior shards merged
    //    in on append; counts recovered from the filename suffix) and is
    //    written before any deletion: index readers never see a partial
    //    or stale-file-referencing view
    val kept = if (truncate) newNames.toSeq
      else oldShards.map(n =>
        (n, n.stripSuffix(".jsonl").split("-").last.toLong)) ++ newNames
    val index = kept.map { case (n, r) => s"""  "$n": $r""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(dir.resolve("_INDEX.json"), index.getBytes("UTF-8"))
    // 3. overwrite semantics: old generation deleted LAST — a mid-commit
    //    crash leaves extra files (glob readers over-read), never a
    //    partially destroyed committed generation
    if (truncate) oldShards.foreach(n =>
      java.nio.file.Files.deleteIfExists(dir.resolve(n)))
    val tmpDir = dir.resolve("_tmp")
    if (java.nio.file.Files.exists(tmpDir) && listDir(tmpDir).isEmpty)
      java.nio.file.Files.delete(tmpDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ShardCommit(tmp, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      case _ => ()
    }
}

final class ShardWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardWriter(schema, path)
}

/** Streams one partition's rows as JSON lines to a temp file. Supported
  * field types: string, int, long, double, boolean (the shard
  * interchange set); anything else is rejected at first row rather than
  * silently stringified.
  */
final class ShardWriter(schema: StructType, path: String)
    extends DataWriter[InternalRow] {

  private val tmpDir = java.nio.file.Paths.get(path, "_tmp")
  java.nio.file.Files.createDirectories(tmpDir)
  private val tmp = tmpDir.resolve(java.util.UUID.randomUUID().toString + ".jsonl")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    java.nio.file.Files.newOutputStream(tmp), "UTF-8"))
  private var rows = 0L

  // escaped once at construction, not re-escaped per row in the hot path
  private val keyPrefix: Array[String] =
    schema.fields.map(f => "\"" + jsonEscape(f.name) + "\":")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case '\n'          => "\\n"
    case '\r'          => "\\r"
    case '\t'          => "\\t"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!first) sb.append(',')
      first = false
      sb.append(keyPrefix(i))
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case StringType  => sb.append('"')
          .append(jsonEscape(row.getUTF8String(i).toString)).append('"')
        case LongType    => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType  =>
          // NaN/Infinity are not legal JSON (RFC 8259) → null
          val d = row.getDouble(i)
          if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
        case BooleanType => sb.append(row.getBoolean(i))
        case dt => throw new IllegalArgumentException(
          s"graft-shards: unsupported field type $dt for '${f.name}'")
      }
    }
    sb.append("}\n")
    out.write(sb.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    ShardCommit(tmp.toString, rows)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}
