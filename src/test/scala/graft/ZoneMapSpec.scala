package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.sources.ZoneMap

/** Pins the s11_zonemap_skip mechanism: min/max manifest written at
  * write time, range predicates resolved driver-side into a file subset
  * (the Delta/Iceberg data-skipping contract), and the
  * degrade-never-fail fallback when the manifest is absent or corrupt.
  */
class ZoneMapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def micros(d: String): Long =
    java.time.LocalDateTime.parse(d)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  private lazy val dir = QueriesR13a.zonemapEventsDir(spark, sf)

  test("write: one manifest line per data file, ranges cover the data") {
    val zones = ZoneMap.readManifest(dir).getOrElse(fail("no manifest"))
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(zones.size === parts, "manifest must describe every data file")
    assert(zones.size >= 25 && zones.size <= 30,
      s"range write should land ~30 files, got ${zones.size}")
    // every zone is well-formed (fixture ts has no nulls) and the
    // manifest's global span equals the table's
    assert(zones.forall(z => z.minMicros.isDefined && z.maxMicros.isDefined))
    assert(zones.forall(z => z.minMicros.get <= z.maxMicros.get))
    val total = zones.map(_.rows).sum
    assert(total === 1000, s"manifest rows must sum to the table: $total")
  }

  test("readPruned: 4-day range scans only the overlapping files") {
    val lo = micros("2024-01-10T00:00")
    val hi = micros("2024-01-14T00:00")
    val zones = ZoneMap.readManifest(dir).get
    val overlap = zones.count(z =>
      z.maxMicros.get >= lo && z.minMicros.get < hi)
    val pruned = ZoneMap.readPruned(spark, dir, lo, hi)
    assert(pruned.inputFiles.length === overlap,
      "scan must contain exactly the manifest-overlapping files")
    assert(overlap < zones.size / 2,
      s"a 4-of-30-day range must skip most files (kept $overlap of " +
        s"${zones.size}) — if this fails the clustering degraded")
    // semantics: pruned + residual == full scan + same predicate
    val resid = pruned.filter(
      unix_micros(col("ts")) >= lo && unix_micros(col("ts")) < hi)
    val full = spark.read.parquet(dir).filter(
      unix_micros(col("ts")) >= lo && unix_micros(col("ts")) < hi)
    assert(resid.count() === full.count())
    assert(resid.agg(sum("event_id")).head.getLong(0) ===
      full.agg(sum("event_id")).head.getLong(0))
  }

  test("readPruned: empty overlap yields an empty, well-typed frame") {
    val lo = micros("2030-01-01T00:00")
    val hi = micros("2030-02-01T00:00")
    val out = ZoneMap.readPruned(spark, dir, lo, hi)
    assert(out.count() === 0L)
    assert(out.columns.contains("ts") && out.columns.contains("event_type"))
  }

  test("missing or corrupt manifest degrades to the full read") {
    val m = Paths.get(dir, "_zonemap.tsv")
    val bak = Paths.get(dir, "_zonemap.tsv.bak")
    val lo = micros("2024-01-10T00:00")
    val hi = micros("2024-01-14T00:00")
    Files.move(m, bak, StandardCopyOption.REPLACE_EXISTING)
    try {
      val all = ZoneMap.readPruned(spark, dir, lo, hi)
      assert(all.inputFiles.length >= 25,
        "absent manifest must fall back to every file")
      Files.write(m, "garbage\twith\nwrong-shape".getBytes)
      val corrupt = ZoneMap.readPruned(spark, dir, lo, hi)
      assert(corrupt.inputFiles.length >= 25,
        "corrupt manifest must fall back to every file, not throw")
    } finally Files.move(bak, m, StandardCopyOption.REPLACE_EXISTING)
  }

  test("graded query: s11 result matches the flat-table computation") {
    val got = Queries.byName("s11_zonemap_skip").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    val lo = micros("2024-01-10T00:00")
    val hi = micros("2024-01-14T00:00")
    val want = graft.engine.Engine.table(spark, sf, "events")
      .filter(unix_micros(col("ts")) >= lo && unix_micros(col("ts")) < hi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}
