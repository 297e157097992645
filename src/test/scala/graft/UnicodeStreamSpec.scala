package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.Enrich
import graft.streaming.Streaming
import graft.sources.Sinks

/** Unicode name handling (the reference's name map carries 'Atlético',
  * 'Bodø/Glimt') and the file-stream deployment shape.
  */
class UnicodeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("name map + trim round-trips Unicode team names byte-identically") {
    val nameMap = Seq(
      ("Atletico Madrid", "Atlético Madrid"),
      ("Bodo/Glimt", "Bodø/Glimt")).toDF("raw", "canonical")
    val facts = Seq("Atletico Madrid", " Bodo/Glimt ", "Bodø/Glimt", "Köln")
      .toDF("team")
    val out = Enrich.normalizeNames(facts, nameMap, Seq("team"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("Atlético Madrid", "Bodø/Glimt", "Köln"))
  }

  test("single-file CSV sink round-trips Unicode + nulls with pinned options") {
    val dir = Files.createTempDirectory("graft_uni_").toString
    val df = Seq(("Atlético", Some(1.5)), ("Bodø/Glimt", None)).toDF("team", "x")
    Sinks.singleFileCsv(df, s"$dir/u.csv")
    val back = spark.read.option("header", "true")
      .schema("team STRING, x DOUBLE").csv(s"$dir/u.csv")
      .orderBy("team").collect()
    assert(back(0).getString(0) == "Atlético" && back(0).getDouble(1) == 1.5)
    assert(back(1).getString(0) == "Bodø/Glimt" && back(1).isNullAt(1))
  }

  test("file-source stream: parquet drop-in → windowed agg → memory sink") {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    // batch-write a first micro-drop the stream will pick up
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 7L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(dir)
    val q = Streaming.hourlyWindowAgg(Streaming.readEventsStream(spark, dir))
      .writeStream.format("memory").queryName("file_stream_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // second drop arrives later — incremental processing
      Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 10:40:00"), 7L, "click", 3.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("file_stream_out")
      .groupBy("hour", "event_type").agg(max("n").as("n"))
      .collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("n") == 2)
  }
}
