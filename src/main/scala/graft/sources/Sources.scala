package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source surface (SURVEY §2.1).
  *
  * S1/S3/S4 (HTTP CSV / REST JSON) are driver-side fetches behind
  * [[Fetcher]] so tests inject canned payloads (zero-egress CI) and the
  * rate-limit contract stays per-client, never parallelized across
  * executors (reference fetch_fbr_team_xg.py:86-88). Parsed payloads enter
  * Spark via `createDataset` + explicit schema — inference is never on a
  * production path.
  */
object Sources {

  /** S6 — empty-but-schema-valid frame. */
  def emptyWithSchema(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** S2 — tolerant CSV scan: read if the path exists, else an empty frame
    * with the canonical schema (reference safe_read,
    * enrich_features.py:17-18). Explicit schema always — the reference's
    * defensive inference becomes a declared contract.
    */
  def tolerantCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(path)))
      spark.read.schema(schema).option("header", "true").csv(path)
    else emptyWithSchema(spark, schema)

  /** S2 for parquet (the engine-native format at scale). */
  def tolerantParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(path))) spark.read.schema(schema).parquet(path)
    else emptyWithSchema(spark, schema)

  /** S7 — manual-override precedence: use the override frame iff it has
    * every required column and at least one row; otherwise the fallback
    * (reference fetch_the_odds_api.py:31-49).
    */
  def withOverride(overrideDf: => Option[DataFrame], required: Seq[String],
                   fallback: => DataFrame): DataFrame =
    overrideDf match {
      case Some(df) if required.forall(df.columns.contains) && !df.isEmpty => df
      case _ => fallback
    }

  /** S1/S3/S4 — driver-side fetch abstraction. Implementations must honor
    * per-client rate limits sequentially; tests provide canned bodies.
    */
  trait Fetcher {
    /** GET the URL, return the body, or None on any failure (the caller
      * degrades to an empty-but-valid frame, reference S6 semantics). */
    def get(url: String, headers: Map[String, String] = Map.empty,
            timeoutSec: Int = 60): Option[String]
  }

  /** Graceful-degradation wrapper: any fetch/parse failure yields the
    * empty-but-valid frame and the pipeline continues
    * (reference fetch_*.py failure paths, exit 0).
    */
  def fetchOrEmpty(spark: SparkSession, schema: StructType)(body: => DataFrame): DataFrame =
    try {
      val df = body
      if (df.schema.fieldNames.sameElements(schema.fieldNames)) df else df.select(
        schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    } catch { case scala.util.control.NonFatal(_) => emptyWithSchema(spark, schema) }
}
