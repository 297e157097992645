package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-6 batch 1: the streaming tier's first ORACLE-graded entry —
  * CDC upsert state replayed through the real Structured Streaming
  * foreachBatch path, graded against its SQL-expressible batch twin.
  */
object QueriesR6a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stream_cdc_state: foreachBatch upsert, batch-twin graded

  private val cdcState = Q(
    "stream_cdc_state",
    "CDC-upsert STATE TABLE built by the real streaming path: the " +
      "events log replays through readStream → foreachBatch " +
      "(Streaming.upsertStream) → temp-swap parquet state, and the " +
      "graded output is the final state — latest event per user by " +
      "(ts, event_id), which is exactly SQL-expressible, so the " +
      "driver's DuckDB oracle hashes output that genuinely flowed " +
      "through Structured Streaming (the only capability tier that " +
      "was spec-graded-only through round 5; StreamingMultimodalSpec " +
      "asserts the streaming query itself ran). State lives in a " +
      "per-run temp dir; the replay input is the engine-normalized " +
      "events frame re-written once so the file stream sees a stable " +
      "schema regardless of the fixture's physical ts encoding.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val base = java.nio.file.Files
        .createTempDirectory("graft_cdc_state_").toString
      val in = s"$base/in"
      val statePath = s"$base/state"
      val ckpt = s"$base/ckpt"
      ev.write.mode("overwrite").parquet(in)
      val stream = s.readStream
        .schema(s.read.parquet(in).schema)
        .parquet(in)
      val sq = graft.streaming.Streaming.upsertStream(stream, statePath, ckpt)
      try {
        sq.processAllAvailable()
      } finally sq.stop()
      s.read.parquet(statePath)
        .select(col("user_id"),
          col("event_id").as("last_event_id"),
          col("ts").as("last_ts"),
          col("event_type").as("last_type"),
          round(col("value") * 100, 0).cast(LongType).as("value_cents"))
        .orderBy("user_id")
    },
    Some("""WITH r AS (
              SELECT user_id, event_id, ts, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            SELECT user_id, event_id AS last_event_id, ts AS last_ts,
                   event_type AS last_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS value_cents
            FROM r WHERE rn = 1 ORDER BY user_id"""))

  val all: Seq[Q] = Seq(cdcState)
}
