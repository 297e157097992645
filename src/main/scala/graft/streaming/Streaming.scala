package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §7): the `events` table is the
  * stream-shaped fixture (event-time `ts`), and these are the streaming
  * twins of the batch operators — same transforms, `readStream` in place
  * of `read`.
  *
  * Scale posture: watermarks bound state; windowed aggregation state is
  * partitioned by group key; sessionization state lives in the state
  * store keyed by user, evicted on timeout. Nothing here is
  * driver-resident.
  */
object Streaming {

  /** Tumbling-window count/sum with a watermark bounding late data and
    * state retention — the streaming twin of query a7_window_hourly.
    */
  def hourlyWindowAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Long, total_value: Double,
                     started: Timestamp, ended: Timestamp, closed: Boolean)

  /** Session accumulator state. */
  case class SessionState(n: Long, total: Double, started: Long, last: Long)

  /** Snapshot sessionization via mapGroupsWithState (Update mode): events
    * within `gapMs` of the previous one extend the session; a larger gap
    * starts a fresh one, and the batch emits only the CURRENT session's
    * snapshot — a session closed by an in-batch gap is not re-emitted, and
    * `NoTimeout` means state is never evicted. This is the
    * drain-everything TEST shape (a processing-time timeout would make
    * `processAllAvailable` non-terminating); production is
    * [[sessionizeEventTime]], which emits every closed session exactly
    * once and evicts its state.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          val evs = it.toSeq.sortBy(_.ts.getTime)
          val merged = evs.foldLeft(state.getOption) {
            case (None, e) =>
              Some(SessionState(1, e.value, e.ts.getTime, e.ts.getTime))
            case (Some(s), e) if e.ts.getTime - s.last <= gapMs =>
              Some(SessionState(s.n + 1, s.total + e.value, s.started, e.ts.getTime))
            case (Some(_), e) => // gap exceeded: start a fresh session
              Some(SessionState(1, e.value, e.ts.getTime, e.ts.getTime))
          }
          merged.foreach(state.update)
          val s = merged.get
          Session(uid, s.n, s.total, new Timestamp(s.started), new Timestamp(s.last),
            closed = false)
      }
  }

  /** Production sessionization: flatMapGroupsWithState in Append mode with
    * an EVENT-TIME timeout under a watermark. Each closed session is
    * emitted exactly once, either when a later event of the same user
    * exceeds the gap (in-stream close) or when the watermark passes
    * last-event-time + gap with no further activity (timeout close, state
    * REMOVED — bounded state at any cardinality of users). Open sessions
    * are never emitted, so downstream sees a clean append-only log of
    * completed sessions.
    */
  def sessionizeEventTime(events: Dataset[Event],
                          gapMs: Long = 30 * 60 * 1000L,
                          watermarkDelay: String = "10 minutes")
                         (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          def close(s: SessionState) =
            Session(uid, s.n, s.total, new Timestamp(s.started),
              new Timestamp(s.last), closed = true)
          if (state.hasTimedOut) {
            // watermark passed last + gap: flush and EVICT
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            val closedSessions = Seq.newBuilder[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur = cur match {
                case Some(s) if e.ts.getTime - s.last <= gapMs =>
                  // min/max guards: events are sorted only WITHIN a batch —
                  // a late (within-watermark) event from a later batch must
                  // not move the session end backwards (it would fire the
                  // timeout early and split one real session in two)
                  Some(SessionState(s.n + 1, s.total + e.value,
                    math.min(s.started, e.ts.getTime), math.max(s.last, e.ts.getTime)))
                case other =>
                  other.foreach(s => closedSessions += close(s)) // in-stream close
                  Some(SessionState(1, e.value, e.ts.getTime, e.ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closedSessions.result().iterator
          }
      }
  }

  /** NATIVE session windows in streaming: groupBy(session_window) under a
    * watermark in Append mode — the built-in counterpart to
    * [[sessionizeEventTime]]'s hand-rolled state machine, and the
    * streaming twin of the batch query w15_session_window. Spark keeps
    * per-user open sessions in the state store, merges windows that an
    * arriving event bridges, and emits a session only once the watermark
    * passes its end (so downstream sees the same append-only closed-
    * session log, with eviction managed by the engine instead of
    * explicit timeout calls). Same merge semantics as batch: an event at
    * exactly gap distance still merges.
    */
  def sessionWindowAgg(events: DataFrame,
                       gap: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("started"),
        col("session_window.end").as("ended"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup with BOUNDED state: duplicates of a key are
    * dropped while the key can still legally reappear (inside the
    * watermark), and the key's state is evicted once the watermark passes
    * it — the streaming twin of `dedup_exact`, and the shape a streaming
    * training-data ingest runs in front of every sink. (A plain
    * `dropDuplicates` on a stream keeps ALL keys forever — unbounded
    * state; `WithinWatermark` is what survives at ingest scale.)
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner join with a bounded time range: each click joins
    * views of the same user within [view.ts, view.ts + windowMs]. Both
    * sides carry watermarks, and the range condition lets Spark evict
    * buffered rows once the watermark passes their join window — state
    * stays bounded on both sides, the non-negotiable at always-on scale.
    */
  def clickAfterViewJoin(views: DataFrame, clicks: DataFrame,
                         windowMs: Long = 10 * 60 * 1000L,
                         watermarkDelay: String = "10 minutes",
                         joinType: String = "inner"): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        // millisecond-precision interval: a seconds-truncated bound would
        // silently shrink sub-second windows to zero
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMs MILLISECOND"),
      // "left_outer" adds eviction-driven null emission: an unmatched
      // view emits (view, null) exactly when the watermark proves no
      // future click can land in its window and its buffered state is
      // dropped — the bounded-state outer-join semantic only streaming
      // engines have
      joinType)
  }

  /** Stream-static enrichment join: every micro-batch of the stream
    * broadcast-joins the (small) static dimension — the streaming twin of
    * the batch enrichment DAG's J1 shape, and the third join form next to
    * stream-stream ([[clickAfterViewJoin]]) and batch-batch. The static
    * side is planned per micro-batch, so a dim refreshed on disk is
    * re-read without restarting the query; no watermark is needed because
    * the static side holds no stream state.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String = "user_id"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming CDC materialization: a `foreachBatch` sink that upserts
    * each micro-batch into a parquet state table by key — the
    * latest-batch row wins per key (within a batch, the row with the
    * highest `ts` then `event_id` wins, deterministically). The state
    * table is read at the START of each batch and rewritten via
    * write-temp-then-swap (the engine's S5 in-place discipline — Spark
    * cannot read and overwrite one path in a single job), so a crash
    * mid-batch leaves the previous state intact and the batch replays.
    * This is the idiomatic lakehouse-less MERGE loop; with a real table
    * format the swap becomes the format's transactional commit, and the
    * full-state rewrite becomes a partition-scoped merge.
    */
  def upsertBatchIntoParquet(batch: DataFrame, path: String,
                             key: String = "user_id"): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val latest = batch
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(key)
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val dir = new java.io.File(path)
    val merged =
      if (dir.exists()) {
        val state = spark.read.parquet(path)
        state.join(latest.select(key), Seq(key), "left_anti")
          .unionByName(latest)
      } else latest
    val tmp = path + ".tmp_swap"
    merged.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(path)
    // remove old state then promote the temp dir — the temp write has
    // already fully succeeded, so the non-atomic window is rename-only
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (target.exists()) rm(target)
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(s"rename $tmp -> $path failed")
  }

  /** The deployment shape around [[upsertBatchIntoParquet]]: stream →
    * foreachBatch upsert → parquet state, with checkpointing.
    */
  def upsertStream(events: DataFrame, statePath: String,
                   checkpoint: String, key: String = "user_id",
                   trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) =>
        upsertBatchIntoParquet(batch, statePath, key))
    trigger.fold(w)(w.trigger).start()
  }

  /** Streaming ingest into a zone-mapped lake — the Auto Loader → Delta
    * pattern: every micro-batch lands as new range-clustered files PLUS
    * manifest lines ([[graft.sources.ZoneMap.append]], an add-file
    * commit per batch; the first batch bootstraps the layout with
    * [[graft.sources.ZoneMap.write]]), so the lake is prunable and
    * metadata-countable the moment a batch commits — no nightly stats
    * rebuild between ingest and query. Small per-batch files are the
    * expected cost; [[graft.sources.ZoneMap.compact]] is the matching
    * maintenance pass (s14). Batch replays after a crash re-append —
    * the same at-least-once contract as any foreachBatch file sink —
    * so production pairs this with the checkpointed batch id in the
    * file name or a dedup on read; the spec pins the happy path and
    * the manifest/file agreement per batch.
    */
  def lakeIngestStream(events: DataFrame, lakeDir: String,
                       checkpoint: String, key: String = "ts",
                       buckets: Int = 4,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // bootstrap on manifest-file ABSENCE, not parse failure — a
        // corrupt manifest must make append fail loudly, never trigger
        // a bootstrapping Overwrite of data already on disk
        val bootstrapped = java.nio.file.Files.isRegularFile(
          java.nio.file.Paths.get(lakeDir, "_zonemap.tsv"))
        if (batch.isEmpty) ()
        else if (!bootstrapped)
          graft.sources.ZoneMap.write(batch, lakeDir, key, buckets)
        else
          graft.sources.ZoneMap.append(batch, lakeDir, key, buckets)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** File-source streaming read of an events directory with the batch
    * schema — the deployment shape (`readStream` → transform →
    * `writeStream` with checkpointing).
    */
  case class UserStats(user_id: Long, n_events: Long, max_value: Double)

  /** Per-user running stats on the `transformWithState` API (Spark 4's
    * arbitrary-state v2, the successor to map/flatMapGroupsWithState):
    * a typed [[org.apache.spark.sql.streaming.ValueState]] accumulates
    * (count, max) per key in the RocksDB state store and every batch
    * emits the keys it touched (Update mode). TWS is where new state
    * features land (typed composite state, TTL, timers, initial state)
    * — this is the minimal correct shape: state access only inside
    * handleInputRows, one emitted row per touched key per batch.
    */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserStats] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "stats", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: ss.TimerValues): Iterator[UserStats] = {
      // -Inf seed, not the MinValue sentinel: an all-NaN/-Inf first batch
      // would otherwise emit (and persist) the sentinel as a "max"
      var (n, mx) = Option(state.get()).getOrElse((0L, Double.NegativeInfinity))
      rows.foreach { e => n += 1; if (e.value > mx) mx = e.value }
      state.update((n, mx))
      Iterator.single(UserStats(key, n, mx))
    }
  }

  /** `transformWithState` requires the RocksDB state store provider. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    spark.readStream.schema(schema).parquet(dir)
  }
}
