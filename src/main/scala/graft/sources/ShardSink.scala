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
  *    `<path>/shard-<k>-<rows>.jsonl` and writes `_INDEX.json` (shard →
  *    row count) LAST — readers that require the index see the output
  *    all-or-nothing;
  *  - abort deletes the temp files; a crashed job leaves only `_tmp`
  *    debris, never a half-visible dataset.
  *
  * Overwrite mode implements `SupportsTruncate` (the existing output is
  * cleared inside driver commit, not before the job — a failed overwrite
  * leaves the previous data intact). Local-filesystem rename semantics
  * match the single-node harness; on an object store the rename step
  * becomes a copy-manifest commit, same protocol shape.
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

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    if (truncate) {
      val old = java.nio.file.Files.list(dir).iterator()
      while (old.hasNext) {
        val p = old.next()
        if (!p.getFileName.toString.startsWith("_tmp"))
          deleteRecursively(p)
      }
    }
    val shards = messages.collect { case ShardCommit(tmp, rows) => (tmp, rows) }
    val index = new StringBuilder("{\n")
    shards.zipWithIndex.foreach { case ((tmp, rows), k) =>
      val name = s"shard-$k-$rows.jsonl"
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      index.append(s"""  "$name": $rows${if (k < shards.length - 1) "," else ""}\n""")
    }
    index.append("}\n")
    // the index is written LAST: its presence is the commit marker
    java.nio.file.Files.write(dir.resolve("_INDEX.json"),
      index.toString.getBytes("UTF-8"))
    val tmpDir = dir.resolve("_tmp")
    if (java.nio.file.Files.exists(tmpDir) &&
        !java.nio.file.Files.list(tmpDir).iterator().hasNext)
      java.nio.file.Files.delete(tmpDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ShardCommit(tmp, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      case _ => ()
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val it = java.nio.file.Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    java.nio.file.Files.deleteIfExists(p)
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
      sb.append('"').append(jsonEscape(f.name)).append("\":")
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case StringType  => sb.append('"')
          .append(jsonEscape(row.getUTF8String(i).toString)).append('"')
        case LongType    => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType  => sb.append(row.getDouble(i))
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
