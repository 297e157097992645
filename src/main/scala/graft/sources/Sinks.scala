package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types.StructType

/** Sink surface (SURVEY §2.1, S5/S6).
  *
  * The reference's downstream stages read ONE csv file, and one stage
  * overwrites its own input in place (enrich_features.py:153,178). Spark
  * writes directories and cannot read+overwrite the same path in a job, so:
  * single-file semantics = coalesce(1) → temp dir → move the part file;
  * in-place overwrite = write temp, then swap. Single-file mode is a
  * parity/debug convenience — at scale callers use [[parquetPartitioned]].
  */
object Sinks {

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p) // must-close resource: leaks a directory fd
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  /** S5 — single-file CSV with header; null ↔ empty-string pinned for
    * byte-stable goldens (SURVEY §4 delta (e)).
    */
  def singleFileCsv(df: DataFrame, target: String): Unit = {
    val tmp = Files.createTempDirectory("graft_csv_").toString
    try {
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").option("nullValue", "").option("emptyValue", "")
        .csv(tmp)
      val listing = Files.list(Paths.get(tmp)) // must-close resource
      val part =
        try listing
          .filter(p => p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".csv"))
          .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
        finally listing.close()
      val dst = Paths.get(target)
      if (dst.getParent != null) Files.createDirectories(dst.getParent)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursive(Paths.get(tmp))
  }

  /** S5 in-place — materialize to temp, THEN overwrite the input path
    * (Spark can't read and overwrite one path in the same job).
    */
  def overwriteCsvInPlace(df: DataFrame, path: String): Unit = {
    val tmp = Files.createTempFile("graft_swap_", ".csv")
    Files.delete(tmp)
    singleFileCsv(df, tmp.toString)
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
  }

  /** S6 — empty-but-valid CSV: header row only. */
  def emptyValidCsv(schema: StructType, target: String): Unit = {
    val dst = Paths.get(target)
    if (dst.getParent != null) Files.createDirectories(dst.getParent)
    Files.writeString(dst, schema.fieldNames.mkString(",") + "\n")
  }

  /** The scale path: partitioned parquet, no coalesce — writers stay
    * parallel, partition columns prune downstream scans.
    */
  def parquetPartitioned(df: DataFrame, target: String,
                         partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(target)
  }

  /** Training-shard writer: directory-partitioned by the stable shard key
    * (each shard is its own `shard=N` directory — shard contents are a
    * pure function of the key, no cross-run drift from task scheduling),
    * shuffled so one task owns each shard's rows (no tiny files from many
    * writers per shard), sorted within for locality, file sizes bounded
    * by maxRecordsPerFile. See the `curate_pack_shards` query for the
    * accounting pass that sizes `numShards`.
    */
  def trainingShards(df: DataFrame, target: String, shardCol: String,
                     numShards: Int, sortCol: String,
                     maxRecordsPerFile: Long = 1000000L): Unit = {
    val c = org.apache.spark.sql.functions.col _
    df.repartition(numShards, c(shardCol))
      .sortWithinPartitions(c(shardCol), c(sortCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(target)
  }
}
