package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Multi-batch replay: the graded streaming queries feed on a SINGLE
  * replay file (one micro-batch) for determinism, and two of them
  * (stream_cdc_state, stream_running_stats) document that single batch as
  * part of their contract. The OTHER graded shapes claim batch-boundary
  * INDEPENDENCE — the stream-stream join emits a set, the event-time
  * windows depend only on watermark progression over ordered input. This
  * spec proves those claims: the same event log split into three
  * ts-ordered files and replayed one file per trigger (three real
  * micro-batches, watermark advancing between them) must emit exactly
  * the single-batch result. Ordered multi-file replay mirrors real
  * ingest (late data inside the watermark delay, never behind it);
  * unordered replay is exactly what the CDC/state contracts exclude.
  *
  * Round 8 extends the replay coverage to every watermark-stateful
  * graded shape — the stream-stream join, session windows, tumbling
  * hourly windows, and streaming dedup — plus the dedup EVICTION EDGE:
  * a key redelivered after its state expired cannot re-emit, because
  * the late-data cut (ts < watermark) always fires before the state
  * cut (ts + delay < watermark) for identical-row redelivery.
  */
class StreamingReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** events at sf0.001, split into 3 ts-ordered files with strictly
    * increasing modification times so the file source replays them in
    * order, one per trigger.
    */
  private def splitInput(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_replay_split_").toString
    val ev = graft.engine.Engine.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
    val n = ev.length
    val schema = graft.engine.Engine.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").schema
    Seq(0 until n / 3, n / 3 until 2 * n / 3, 2 * n / 3 until n)
      .zipWithIndex.foreach { case (range, i) =>
        val part = spark.createDataFrame(
          java.util.Arrays.asList(range.map(ev): _*), schema)
        val sub = s"$dir/part$i"
        part.coalesce(1).write.mode("overwrite").parquet(sub)
        // one data file per chunk, mtimes strictly increasing
        val f = new java.io.File(sub).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val ok = f.setLastModified(1700000000000L + i * 60000L)
        assert(ok, s"could not stamp mtime on $f")
        f.renameTo(new java.io.File(s"$dir/chunk$i.parquet"))
      }
    dir
  }

  private def streamOneFilePerTrigger(dir: String): DataFrame =
    spark.readStream
      .schema(Streaming.readEventsStream(spark, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  private def runToParquet(out: DataFrame, base: String,
                           minBatches: Int = 1): DataFrame = {
    val sq = out.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    try {
      sq.processAllAvailable()
      // batchId is 0-based: seeing id >= minBatches-1 proves the source
      // really split the replay (otherwise maxFilesPerTrigger silently
      // ignored would make the multi-batch test vacuous)
      val lastId = Option(sq.lastProgress).map(_.batchId).getOrElse(-1L)
      assert(lastId >= minBatches - 1,
        s"expected >= $minBatches micro-batches, last batchId was $lastId")
    } finally sq.stop()
    spark.read.parquet(s"$base/out")
  }

  test("shared replay input is ONE data file — the single-batch contract's foundation") {
    // stream_cdc_state and stream_running_stats grade latest/Update-mode
    // output whose determinism rests on the whole log replaying as one
    // micro-batch; that in turn rests on the shared replay dir holding
    // exactly one parquet part. Ratchet it: a future coalesce removal
    // fails here, not as a cross-engine grading mystery.
    val df = Queries.byName("stream_cdc_state").fn(spark, sf)
    assert(df.count() > 0)
    // assert on THIS JVM's memoized dir, not a global tmpdir scan (which
    // could hit stale dirs from crashed prior JVMs or a concurrently-
    // writing one). ADVICE r7.
    val dir = new java.io.File(QueriesR6a.replayDirFor(spark, sf))
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parts == 1,
      s"replay input $dir holds $parts parquet parts, contract is 1")
  }

  test("stream-stream join emits the identical set across 3 ordered micro-batches") {
    val dir = splitInput()
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_vc_").toString
    def side(tpe: String) = streamOneFilePerTrigger(dir)
      .filter(col("event_type") === tpe)
      .select("event_id", "ts", "user_id")
    val multi = runToParquet(
      Streaming.clickAfterViewJoin(side("view"), side("click"),
        windowMs = 240L * 60 * 1000)
        .select(col("view_id"), col("click_id")), base, minBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: the same interval join as a plain self-join
    val ev = graft.engine.Engine.table(spark, sf, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("u"), col("event_id").as("view_id"),
        col("ts").as("vts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val expected = v.join(c, "u")
      .filter(col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr("INTERVAL 240 MINUTE"))
      .select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi == expected,
      s"multi-batch join emitted ${multi.size} pairs, batch twin has " +
        s"${expected.size}; symm-diff ${(multi diff expected).size + (expected diff multi).size}")
  }

  test("outer interval join emits the identical set across 3 ordered micro-batches") {
    // matched pairs emit on match; unmatched views emit a null row at
    // eviction — with ordered replay, every click inside a view's window
    // arrives before the watermark can evict that view (the watermark
    // lags max event time by the delay), so the final emitted set
    // depends only on the FINAL watermark, not on batch boundaries
    val dir = splitInput()
    def side(tpe: String) = streamOneFilePerTrigger(dir)
      .filter(col("event_type") === tpe)
      .select("event_id", "ts", "user_id")
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.toString).getOrElse("∅")))
      .toSet
    val multi = key(runToParquet(
      Streaming.clickAfterViewJoin(side("view"), side("click"),
        windowMs = 240L * 60 * 1000, joinType = "left_outer")
        .select(col("v_user"), col("view_id"), col("view_ts"),
          col("click_id")), java.nio.file.Files
        .createTempDirectory("graft_replay_oj_").toString, minBatches = 3))
    def single(tpe: String) = spark.readStream
      .schema(Streaming.readEventsStream(spark, dir).schema).parquet(dir)
      .filter(col("event_type") === tpe)
      .select("event_id", "ts", "user_id")
    val one = key(runToParquet(
      Streaming.clickAfterViewJoin(single("view"), single("click"),
        windowMs = 240L * 60 * 1000, joinType = "left_outer")
        .select(col("v_user"), col("view_id"), col("view_ts"),
          col("click_id")), java.nio.file.Files
        .createTempDirectory("graft_replay_oj1_").toString))
    assert(multi == one,
      s"multi-batch outer join emitted ${multi.size} rows, single-batch ${one.size}")
  }

  test("hourly windows close identically across 3 ordered micro-batches") {
    val dir = splitInput()
    def agg(src: DataFrame) =
      Streaming.hourlyWindowAgg(
        src.select(col("ts"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("value")), "2 hours")
        .withColumnRenamed("sum_value", "cents")
    def collect(df: DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val multi = collect(runToParquet(
      agg(streamOneFilePerTrigger(dir)),
      java.nio.file.Files.createTempDirectory("graft_replay_hr_").toString,
      minBatches = 3))
    val single = collect(runToParquet(
      agg(spark.readStream
        .schema(Streaming.readEventsStream(spark, dir).schema).parquet(dir)),
      java.nio.file.Files.createTempDirectory("graft_replay_hr1_").toString))
    assert(multi == single,
      s"multi-batch emitted ${multi.size} closed windows, single-batch ${single.size}")
  }

  test("streaming dedup emits exactly DISTINCT across 3 ordered micro-batches of doubled delivery") {
    // the graded stream_ingest_dedup replays one batch; this proves the
    // claim that MORE batches emit the same set when both deliveries of a
    // key arrive inside the watermark (each trigger reads chunk k from
    // both source instances — mtime order is shared)
    val dir = splitInput()
    def delivery() = streamOneFilePerTrigger(dir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val multi = runToParquet(
      Streaming.dedupStream(delivery().unionAll(delivery()), Seq("event_id")),
      java.nio.file.Files.createTempDirectory("graft_replay_dd_").toString,
      minBatches = 3)
      .collect().map(_.getLong(0)).toSeq
    val expected = graft.engine.Engine.table(spark, sf, "events")
      .select("event_id").distinct().collect().map(_.getLong(0)).toSet
    assert(multi.size == multi.toSet.size,
      s"dedup re-emitted ${multi.size - multi.toSet.size} keys")
    assert(multi.toSet == expected,
      s"dedup emitted ${multi.toSet.size} keys, distinct log has ${expected.size}")
  }

  test("dedup eviction edge: a duplicate delivered AFTER its key's state expired is late-dropped, never re-emitted") {
    // dropDuplicatesWithinWatermark evicts a key's state once the
    // watermark passes ts + delay — but an input row is dropped as LATE
    // once the watermark passes ts alone, which happens FIRST. So an
    // identical redelivered row is either deduped (state still alive) or
    // late-dropped (state gone); re-emission is impossible for
    // identical-row redelivery at ANY batch boundary. Pin exactly that
    // with a hand-built 3-batch replay around the eviction boundary.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    def write(dir: String, name: String, mtime: Long,
              rows: Seq[(Long, String)]): Unit = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map { case (id, t) =>
          Row(id, Timestamp.valueOf(t)) }: _*), schema)
      val sub = s"$dir/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(sub)
      val f = new java.io.File(sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(f.setLastModified(mtime))
      assert(f.renameTo(new java.io.File(s"$dir/$name.parquet")))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_replay_evict_").toString
    // delay = 10 min. batch 0: key 1 @10:00. batch 1: key 99 @11:00 →
    // watermark 10:50 → key 1's state (expiry 10:10) evicted. batch 2:
    // key 1 redelivered @10:00 (below watermark → late-dropped), key 2
    // @10:55 (fresh, above watermark → emitted), key 99 redelivered
    // @11:00 (state alive → deduped).
    write(dir, "chunk0", 1700000000000L, Seq(1L -> "2024-01-01 10:00:00"))
    write(dir, "chunk1", 1700000060000L, Seq(99L -> "2024-01-01 11:00:00"))
    write(dir, "chunk2", 1700000120000L, Seq(
      1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:55:00",
      99L -> "2024-01-01 11:00:00"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_evict_out_").toString
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = runToParquet(
      Streaming.dedupStream(stream, Seq("event_id")), base, minBatches = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 99L),
      s"expected each key exactly once (1, 2, 99), got $out")
  }

  test("session windows close identically across 3 ordered micro-batches") {
    val dir = splitInput()
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_ss_").toString
    val stream = streamOneFilePerTrigger(dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("value"))
    val multi = runToParquet(
      Streaming.sessionWindowAgg(stream)
        .select("user_id", "started", "ended", "n_events"), base,
      minBatches = 3)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // single-batch twin through the SAME operator: ordered replay means
    // no event is ever behind the watermark, so only watermark
    // PROGRESSION differs — and closed-session emission is cumulative,
    // so the final sets must agree
    val base2 = java.nio.file.Files
      .createTempDirectory("graft_replay_ss1_").toString
    val single = runToParquet(
      Streaming.sessionWindowAgg(
        spark.readStream
          .schema(Streaming.readEventsStream(spark, dir).schema)
          .parquet(dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            round(col("value") * 100, 0).cast("long").as("value")))
        .select("user_id", "started", "ended", "n_events"), base2)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(multi == single,
      s"multi-batch emitted ${multi.size} sessions, single-batch " +
        s"${single.size}")
  }
}
