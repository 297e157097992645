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
