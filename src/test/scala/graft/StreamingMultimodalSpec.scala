package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.streaming.Streaming.{Event, Session}
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("stream_cdc_state's output flows through the foreachBatch streaming path") {
    // the graded query must not quietly degrade to a batch shortcut: a
    // listener counts streaming-query starts while the query fn runs
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_cdc_state")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      assert(rows.nonEmpty, "CDC state table is empty")
      // listener events are async — poll with a deadline instead of one
      // fixed sleep (a loaded machine can outlast any single sleep)
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // state is latest-per-user: user ids unique
      val ids = rows.map(_.getAs[Long]("user_id"))
      assert(ids.distinct.length == ids.length)
    } finally spark.streams.removeListener(listener)
  }

  private def awaitStarted(started: () => Int,
                           deadlineMs: Long = 20000L): Unit = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    while (started() < 1 && System.nanoTime() < end) Thread.sleep(50)
  }

  test("stream_session_state emits watermark-closed sessions via streaming") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_session_state")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      assert(rows.nonEmpty, "no closed sessions emitted")
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // emitted sessions are exactly the batch session_window result
      // minus sessions the final (ms-truncated) watermark never passed
      val ev = graft.engine.Engine.table(spark, "/root/testdata/sf0.001", "events")
      val batch = ev
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.end").as("ended"))
      val maxMs = ev.agg(max("ts")).collect()(0).getTimestamp(0).getTime
      val wm = new Timestamp(maxMs - 10 * 60 * 1000L)
      // <= : Spark's WatermarkSupport eviction predicate is
      // LessThanOrEqual (4.1.2 bytecode) — a session ending exactly ON
      // the watermark is emitted
      val expected = batch.filter(col("ended") <= lit(wm)).count()
      assert(rows.length.toLong == expected,
        s"emitted ${rows.length} sessions, batch-twin expects $expected")
      // per-user sessions don't overlap: starts strictly increase
      val byUser = rows.groupBy(_.getAs[Long]("user_id"))
      byUser.values.foreach { ss =>
        val starts = ss.map(_.getAs[Timestamp]("started").getTime).sorted
        assert(starts.distinct.length == starts.length)
      }
    } finally spark.streams.removeListener(listener)
  }

  test("stream_view_click_join emits the exact batch join set via streaming") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_view_click_join")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      assert(rows.nonEmpty, "no view→click matches emitted")
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // the emitted set must equal the batch self-join exactly — inner
      // interval joins emit on match, independent of batching
      val ev = graft.engine.Engine.table(spark, "/root/testdata/sf0.001", "events")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("ts").as("vts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
      val batch = v.join(c, col("vu") === col("cu") &&
          col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr("INTERVAL 240 MINUTE"))
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamed = rows.map(r =>
        (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} pairs, batch twin has ${batch.size}")
      // every match is a click at-or-after its view
      rows.foreach { r =>
        assert(!r.getAs[Timestamp]("click_ts").before(r.getAs[Timestamp]("view_ts")))
      }
    } finally spark.streams.removeListener(listener)
  }

  test("stream_running_stats emits final per-user state via transformWithState") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_running_stats")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      assert(rows.nonEmpty, "no running stats emitted")
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // the single-batch emission equals the batch groupBy twin exactly
      val ev = graft.engine.Engine.table(spark, "/root/testdata/sf0.001", "events")
      val batch = ev.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          round(max("value") * 100, 0).cast("long").as("mc"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      rows.foreach { r =>
        val exp = batch(r.getAs[Long]("user_id"))
        assert((r.getAs[Long]("n_events"), r.getAs[Long]("max_cents")) == exp)
      }
      assert(rows.length == batch.size, "a user is missing from the state")
    } finally spark.streams.removeListener(listener)
  }

  test("stream_enrich_dim broadcast-enriches the stream 1:1 with the batch join") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_enrich_dim")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // stateless 1:1 enrichment: one output row per input event, and
      // every row resolved its dimension columns (full key coverage)
      val sf = "/root/testdata/sf0.001"
      val nEvents = graft.engine.Engine.table(spark, sf, "events").count()
      assert(rows.length.toLong == nEvents, "enrichment dropped or duplicated rows")
      assert(rows.forall(r => !r.isNullAt(r.fieldIndex("user_name"))),
        "a joined dimension column came back null despite full key coverage")
    } finally spark.streams.removeListener(listener)
  }

  test("stream_hourly_rollup emits watermark-closed tumbling windows via streaming") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_hourly_rollup")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      assert(rows.nonEmpty, "no closed windows emitted")
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // emitted windows are exactly the batch tumbling-window rollup
      // minus windows the final (ms-truncated) watermark never passed —
      // <= because WatermarkSupport evicts/emits with LessThanOrEqual
      // (4.1.2 bytecode), and compare VALUES per window, not just the
      // emitted count, so a broken rename/quantization upstream of the
      // agg fails here rather than only in the DuckDB pass
      val ev = graft.engine.Engine.table(spark, "/root/testdata/sf0.001", "events")
      val maxMs = ev.agg(max("ts")).collect()(0).getTimestamp(0).getTime
      val wm = new Timestamp(maxMs - 2 * 60 * 60 * 1000L)
      val expected = ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        .filter(col("window.end") <= lit(wm))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("cents"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val got = rows
        .map(r => (r.getAs[Timestamp]("hour"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Long]("cents"))).toSet
      assert(got == expected,
        s"emitted ${got.size} windows, batch-twin expects ${expected.size}" +
          s" (value-level symm-diff ${(got diff expected).size + (expected diff got).size})")
      // append-only closed-window log: (hour, type) keys are unique
      val keys = rows.map(r => (r.getAs[Timestamp]("hour"),
        r.getAs[String]("event_type")))
      assert(keys.distinct.length == keys.length, "duplicate window emitted")
    } finally spark.streams.removeListener(listener)
  }

  test("stream_ingest_dedup collapses the doubled delivery via streaming state") {
    @volatile var started = 0
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started += 1
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // memoized stream results would satisfy the row assertions without a
    // stream ever starting — clear the memo so THIS call runs the query
    QueriesR6a.clearResultMemo()
    try {
      val out = Queries.byName("stream_ingest_dedup")
        .fn(spark, "/root/testdata/sf0.001")
      val rows = out.collect()
      spark.streams.resetTerminated()
      awaitStarted(() => started)
      assert(started >= 1, "no Structured Streaming query ran")
      // the input was every event delivered twice; the output must be the
      // log itself — exactly one row per event_id, count = table count
      val n = graft.engine.Engine
        .table(spark, "/root/testdata/sf0.001", "events").count()
      assert(rows.length.toLong == n,
        s"dedup emitted ${rows.length} rows, log has $n")
      val ids = rows.map(_.getAs[Long]("event_id"))
      assert(ids.distinct.length == ids.length, "duplicate event_id emitted")
    } finally spark.streams.removeListener(listener)
  }

  test("streaming hourly window agg over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    mem.addData(events: _*)
    val q = Streaming.hourlyWindowAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .groupBy("hour", "event_type").agg(max("n").as("n"), max("sum_value").as("s"))
      .orderBy("hour").collect()
    val batch = Streaming.hourlyWindowAgg(events.toDF())
      .orderBy("hour").collect()
    assert(streamed.length == batch.length && batch.length == 2)
    assert(batch(0).getAs[Long]("n") == 2 && batch(0).getAs[Double]("sum_value") == 3.0)
  }

  test("sessionization: gap splits sessions, state accumulates within gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(90), 1, "click", 4.0), // 85-min gap > 30-min session gap
      Event(4, ts(0), 2, "view", 7.0))
    val q = Streaming.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sessions_out").as[Session].collect()
    val u1 = out.filter(_.user_id == 1)
    // last state for user 1: fresh session after the gap, single event
    assert(u1.exists(s => s.n_events == 1 && s.total_value == 4.0))
    val u2 = out.filter(_.user_id == 2)
    assert(u2.exists(s => s.n_events == 1 && s.total_value == 7.0))
  }

  test("event-time sessionization: closed sessions emitted once, state evicted") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.sessionizeEventTime(mem.toDS())
      .writeStream.format("memory").queryName("sessions_et")
      .outputMode("append").start()
    try {
      // batch 1: user 1 builds a 2-event session; user 2 a 1-event session
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(0), 2, "view", 7.0))
      q.processAllAvailable()
      // batch 2: user 2 returns 3 h later → in-stream close of their first
      // session; also advances the watermark to ts(180) − 10 min
      mem.addData(Event(4, ts(180), 2, "view", 9.0))
      q.processAllAvailable()
      // batch 3: unrelated user triggers timeout evaluation — user 1's
      // (last=ts(5)) + 30 min gap is far below the watermark → flush+evict
      mem.addData(Event(5, ts(185), 3, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sessions_et").as[Session].collect()
    assert(out.forall(_.closed), "append log must contain only closed sessions")
    val u1 = out.filter(_.user_id == 1)
    assert(u1.length == 1, s"idle user's session closed exactly once: ${u1.toSeq}")
    assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
    val u2 = out.filter(_.user_id == 2)
    assert(u2.length == 1 && u2.head.n_events == 1 && u2.head.total_value == 7.0)
    // user 2's second session and user 3's are still open → not emitted
    assert(!out.exists(_.user_id == 3))
  }

  test("native session_window stream: closed session emitted once, open withheld") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.sessionWindowAgg(mem.toDF())
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart → one session [ts(0), ts(5)+30min)
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      // a much later event advances the watermark past user 1's session
      // end (ts(5)+30min); Append emits the closed session, state evicted
      mem.addData(Event(3, ts(180), 2, "view", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sw_sessions")
      .select("user_id", "n_events", "total_value").collect()
    assert(out.length == 1, s"only the watermark-passed session: ${out.toSeq}")
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L &&
      out.head.getDouble(2) == 3.0)
    // user 2's session is still open (watermark hasn't passed it) → withheld
  }

  test("streaming dedup within watermark: dups dropped, output append-only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // dup key in-batch
        Event(2, ts(2), 2, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(3), 2, "view", 2.0)) // dup key across batches
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("stream-stream join: clicks match views of same user within window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = Streaming.clickAfterViewJoin(views.toDF(), clicks.toDF(),
        windowMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("vc_join")
      .outputMode("append").start()
    try {
      views.addData(Event(10, ts(0), 1, "view", 0.0), Event(11, ts(0), 2, "view", 0.0))
      clicks.addData(
        Event(20, ts(3), 1, "click", 1.0),   // within 5 min of view 10
        Event(21, ts(30), 2, "click", 1.0))  // 30 min later: outside window
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("vc_join")
      .select("view_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((10L, 20L)))
  }

  test("stream-static join: each batch enriches against the broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = Streaming.enrichStream(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 9, "view", 3.0)) // no dim row → left join null
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enrich_out").select("event_id", "tier")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(rows.toSeq ==
      Seq((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("foreachBatch upsert: parquet state converges to latest row per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_")
    val (statePath, ckpt) = (s"$base/state", s"$base/ckpt")
    val q = Streaming.upsertStream(mem.toDF(), statePath, ckpt)
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "view", 2.0), // same user, later → wins batch 1
        Event(3, ts(1), 2, "view", 3.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(5), 2, "click", 9.0)) // updates user 2
      mem.addData(Event(5, ts(6), 3, "view", 7.0))  // inserts user 3
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.parquet(statePath)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(state.toSeq ==
      Seq((1L, 2L, 2.0), (2L, 4L, 9.0), (3L, 5L, 7.0)),
      "state must hold exactly the latest row per user")
  }

  test("transformWithState: running per-user stats accumulate across batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = Streaming.runningUserStats(mem.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        mem.addData(Event(1, ts(0), 1, "click", 5.0), Event(2, ts(1), 1, "click", 9.0),
          Event(3, ts(0), 2, "view", 2.0))
        q.processAllAvailable()
        mem.addData(Event(4, ts(2), 1, "click", 7.0)) // state must persist
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("tws_out")
        .as[Streaming.UserStats].collect()
      // batch 1 snapshot for user 1, then batch 2 carries the count ON
      assert(out.exists(s => s.user_id == 1 && s.n_events == 2 && s.max_value == 9.0))
      assert(out.exists(s => s.user_id == 1 && s.n_events == 3 && s.max_value == 9.0))
      assert(out.exists(s => s.user_id == 2 && s.n_events == 1 && s.max_value == 2.0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multimodal: deterministic fake decode, checksum, batch shape") {
    implicit val s = spark
    val rows = Seq(
      MediaRow(1, Array[Byte](10, 20, 30), MediaMeta("image", 64, 48, 0)),
      MediaRow(2, Array.fill[Byte](100)(1), MediaMeta("audio", 0, 0, 16000)))
      .toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.id)
    assert(feats(0).n_bytes == 3 && feats(0).media_type == "image")
    assert(math.abs(feats(0).features(0) - 10 / 255.0f) < 1e-6)
    assert(feats(1).features(0) > 0) // 100 bytes folded into 8 dims
    // determinism: same payload → same checksum
    val again = Multimodal.extractFeatures(rows).collect().sortBy(_.id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("multimodal: PNG/WAV header build->parse round-trips the published layouts") {
    import org.apache.spark.sql.functions.{col, hex, unhex}
    val df = Seq((256, 1, 44100), (16, 1039, 8000), (1, 1, 176400))
      .toDF("w", "h", "sr")
      .select(col("w"), col("h"), col("sr"),
        Multimodal.pngHeaderBytes(col("w"), col("h")).as("png"),
        Multimodal.wavHeaderBytes(col("sr")).as("wav"))
    val out = df.select(
      Multimodal.pngWidth(col("png")).as("pw"),
      Multimodal.pngHeight(col("png")).as("ph"),
      Multimodal.wavSampleRate(col("wav")).as("psr"),
      Multimodal.mediaType(col("png")).as("tpng"),
      Multimodal.mediaType(col("wav")).as("twav"),
      hex(col("png")).as("pnghex"), hex(col("wav")).as("wavhex"))
      .collect()
    out.zip(Seq((256, 1, 44100), (16, 1039, 8000), (1, 1, 176400))).foreach {
      case (r, (w, h, sr)) =>
        assert(r.getAs[Int]("pw") == w && r.getAs[Int]("ph") == h)
        assert(r.getAs[Int]("psr") == sr)
        assert(r.getAs[String]("tpng") == "png" && r.getAs[String]("twav") == "wav")
    }
    // golden bytes: the exact published layouts, not just self-consistency.
    // PNG: signature, IHDR len 13, "IHDR", w=256, h=1 big-endian, then all
    // 13 declared data bytes incl. the interlace byte.
    assert(out(0).getAs[String]("pnghex") ==
      "89504E470D0A1A0A0000000D4948445200000100" + "00000001" + "0806000000")
    // WAV: "RIFF", size 36, "WAVE", full 16-byte fmt body (PCM, stereo,
    // 44100 LE, byte rate 176400 LE, block align 4, bits 16), empty data
    // chunk — declared sizes all consistent with the emitted 44 bytes.
    assert(out(0).getAs[String]("wavhex") ==
      "524946462400000057415645666D7420100000000100020044AC0000" +
        "10B1020004001000" + "6461746100000000")
    // corrupt payloads parse to null, not an ANSI overflow crash
    val corrupt = Seq(
      ("89504E470D0A1A0A0000000D49484452FFFFFFFF" + "00000001" + "0806000000",
        "52494646" + "24000000" + "57415645" + "666D7420" + "10000000" +
          "0100" + "0200" + "FFFFFFFF")).toDF("p", "w")
      .select(Multimodal.pngWidth(unhex(col("p"))).as("pw"),
        Multimodal.wavSampleRate(unhex(col("w"))).as("sr"))
      .collect()(0)
    assert(corrupt.isNullAt(0) && corrupt.isNullAt(1))
    // unknown container sniffs as unknown
    val unk = Seq(Array[Byte](1, 2, 3, 4, 5)).toDF("p")
      .select(Multimodal.mediaType(col("p"))).collect()(0).getString(0)
    assert(unk == "unknown")
  }

  test("multimodal: JPEG SOF walk finds dims behind variable segments; corrupt payload → 0/null") {
    import org.apache.spark.sql.functions.{col, hex, lit}
    val df = Seq((480, 640, 0, 0), (1024, 2048, 7, 4), (1, 1, 3, 2))
      .toDF("h", "w", "ap", "cp")
      .select(col("h"), col("w"), col("ap"), col("cp"),
        hex(Multimodal.jpegHeaderBytes(col("h"), col("w"), col("ap"), col("cp")))
          .as("hx"))
      .withColumn("sof", Multimodal.jpegSofOffset(col("hx")))
      .select(col("h"), col("w"), col("ap"), col("cp"), col("sof"),
        Multimodal.jpegHeight(col("hx"), col("sof")).as("ph"),
        Multimodal.jpegWidth(col("hx"), col("sof")).as("pw"))
    df.collect().foreach { r =>
      val (h, w, ap, cp) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(r.getInt(4) == 27 + ap + cp, s"walk offset: $r")
      assert(r.getInt(5) == h && r.getInt(6) == w, s"dims: $r")
    }
    // SOI followed by non-SOF segments only: walk exhausts its bound,
    // returns 0, dims null — corrupt media must not kill the job
    val corrupt = Seq("FFD8" + "FFE000104A4649460000000000000000" + "FFD9")
      .toDF("hxs")
      .select(Multimodal.jpegSofOffset(col("hxs")).as("sof"),
        Multimodal.jpegHeight(col("hxs"), Multimodal.jpegSofOffset(col("hxs")))
          .as("ph"))
      .collect()(0)
    assert(corrupt.getInt(0) == 0)
    assert(corrupt.isNullAt(1))
    // truncated INSIDE the SOF0 segment: the walk finds the marker but
    // the dim fields are cut off → null, not a partial-parse garbage dim
    val truncated = Seq("FFD8" + "FFC0" + "000B" + "08" + "01")
      .toDF("hxs")
      .select(Multimodal.jpegHeight(col("hxs"),
        Multimodal.jpegSofOffset(col("hxs"))).as("ph"))
      .collect()(0)
    assert(truncated.isNullAt(0), s"truncated payload parsed to $truncated")
  }

  test("multimodal: resize metadata + frame sampling shapes") {
    implicit val s = spark
    val rows = Seq(MediaRow(1, Array.fill[Byte](1000)(7), MediaMeta("video", 640, 480, 0))).toDS()
    val resized = Multimodal.resizeMeta(rows.toDF(), 320, 240)
      .select("meta.width", "meta.height").collect()(0)
    assert(resized.getInt(0) == 320 && resized.getInt(1) == 240)
    val frames = Multimodal.sampleFrames(rows, frameBytes = 100, everyK = 2).collect()(0)
    assert(frames.getAs[Int]("n_frames") == 5) // 10 chunks, every 2nd
  }
}
