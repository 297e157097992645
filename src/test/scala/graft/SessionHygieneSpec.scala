package graft

/** Session steady-state ratchet (round 10 — VERDICT r9's #1 engine gap:
  * "a long-lived session accumulates drag").
  *
  * Round 9's bench regressed 14-20% with FLAT isolated per-query times;
  * the probe traced the accumulating mechanisms to the streaming path:
  * Spark 4.1's ChecksumCheckpointFileManager spawns a thread pool PER
  * checkpoint location and never shuts it down (+4 threads per stream
  * run, 530 live threads by the end of a two-pass inventory), and
  * stopped queries leave their state-store providers loaded (heap +
  * maintenance work) until the 60 s maintenance tick. The fixes:
  * checksum manager disabled for the per-run ephemeral checkpoints
  * (QueriesR6a.streamScaffoldConfs) and an immediate provider unload on
  * stream stop (StateHooks.releaseAfterStreamStop).
  *
  * This spec pins steady-state directly: run a stateful streaming query
  * and a batch query ALTERNATING (memo cleared each time, so every
  * iteration runs a genuinely fresh stream with a fresh checkpoint dir),
  * and assert (a) zero state-store providers stay loaded after each
  * stop, and (b) the live-thread count does not grow across iterations
  * beyond a small jitter allowance. A reintroduced per-run pool or
  * provider leak fails (b) within a handful of iterations — this is the
  * regression test the round-9 drag never had.
  */
class SessionHygieneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("alternating stream+batch runs hold threads and providers steady") {
    def runQ(name: String): Unit = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      Queries.byName(name).fn(spark, sf).write
        .format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
    }
    def iteration(): Unit = {
      QueriesR6a.clearResultMemo() // force a real stream, fresh ckpt dir
      runQ("stream_session_state")
      assert(
        org.apache.spark.sql.graft.StateHooks.loadedProviderCount() == 0,
        "state-store providers stayed loaded after the stream stopped")
      runQ("a5_count_groups")
    }
    // Count only threads from PER-RUN pools — the leak classes this
    // ratchet exists for: the checkpoint checksum manager (one pool per
    // checkpoint location, never shut down), streaming query execution
    // threads, state-store maintenance workers, RocksDB natives. Spark's
    // demand-elastic CACHED pools (block-manager ask/storage, AQE's
    // QueryStageCreator/shuffle-exchange) grow under load and shrink
    // after their 60 s keep-alive — counting those makes the assertion
    // flaky without catching anything (census: they dominate raw
    // Thread.activeCount deltas and plateau).
    def perRunThreads(): Int = {
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.keySet().asScala.count { t =>
        val n = t.getName
        n.startsWith("ChecksumCheckpointFileManager") ||
          n.contains("state-store-maintenance") ||
          n.startsWith("stream execution thread") ||
          n.toLowerCase.contains("rocksdb")
      }
    }
    // warm-up: first runs pay one-time pools that are NOT per-run state
    iteration(); iteration()
    val baseline = perRunThreads()
    val iters = 5
    (1 to iters).foreach(_ => iteration())
    val after = perRunThreads()
    // a reintroduced per-checkpoint pool (+4/run pre-fix) or an unstopped
    // stream/maintenance worker grows this monotonically; steady pools
    // (the shared maintenance timer) stay within the allowance
    val allowed = 2
    assert(after - baseline <= allowed,
      s"per-run pool threads grew $baseline -> $after over $iters " +
        s"stream+batch iterations (> +$allowed): a per-checkpoint pool, " +
        "stream thread, or state-store worker is leaking")
  }
}
