package graft

import org.apache.spark.sql.graft.StateHooks

/** Pins `StateHooks.liveStreamThreadCount` against the DEPLOYED Spark
  * (ADVICE r11): the census keys off the internal `QueryExecutionThread`
  * name prefix "stream execution thread". If a Spark upgrade renames it,
  * the census silently returns 0 and `releaseAfterStreamStop`'s
  * JVM-global `unloadAll` re-opens the race against sibling sessions'
  * running streams that the census was added to close. This spec makes
  * that silent regression a loud test failure: a genuinely running
  * stream MUST be counted, and a fully-stopped world must count 0.
  */
class StreamThreadCensusSpec extends SparkSpec {

  test("a running streaming query is seen by the live-stream census") {
    // checksum manager OFF for this throwaway checkpoint: Spark 4.1's
    // ChecksumCheckpointFileManager spawns a JVM-permanent thread pool
    // per checkpoint location (the round-9 leak class) — leaving it on
    // here plants ~4 threads that SessionHygieneSpec's per-run census
    // then counts, making THAT suite order-sensitive
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val ckWas = spark.conf.getOption(ckKey)
    spark.conf.set(ckKey, "false")
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("census_ckpt_").toString)
      .start()
    try {
      // the execution thread exists for the query's whole lifetime (it IS
      // the micro-batch loop) — live from start() return until stop()
      q.processAllAvailable()
      assert(StateHooks.liveStreamThreadCount() >= 1,
        "running stream not counted: Spark renamed QueryExecutionThread " +
          "('stream execution thread' prefix) — update StateHooks census " +
          "or unloadAll races sibling sessions again")
    } finally {
      q.stop()
      ckWas match {
        case Some(v) => spark.conf.set(ckKey, v)
        case None    => spark.conf.unset(ckKey)
      }
    }
    q.awaitTermination()
    assert(StateHooks.liveStreamThreadCount() == 0,
      "census counts a thread after the only stream stopped")
  }
}
