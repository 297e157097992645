package graft

/** RocksDB state-store parity for the watermark-stateful graded shapes
  * (VERDICT r8/r9 task): the four inventory streaming queries that run on
  * the default HDFS-backed state store — session windows, the two
  * stream-stream joins, and streaming dedup — must emit the IDENTICAL
  * result set under
  * `spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider`.
  *
  * Why this matters at scale: the HDFS-backed provider keeps every state
  * row on the executor HEAP (one map per store), so state volume is
  * bounded by executor memory; RocksDB is the production answer for state
  * that spills (100 GB+ of join/session state on a real cluster). The
  * engine's streaming operators must not depend on provider-specific
  * semantics — this spec pins that: same rows, same values, both stores.
  *
  * The provider conf is read at STREAM START (each inventory query starts
  * its streams from a fresh checkpoint dir per run), so flipping the
  * session conf between runs of the same query exercises two genuinely
  * separate state-store stacks over the same replay input.
  */
class RocksDBStateStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Key = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def emitted(name: String): Seq[String] =
    Queries.byName(name).fn(spark, sf)
      .collect().map(_.toString).sorted.toSeq

  private def parity(name: String): Unit = {
    val default = emitted(name)
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, RocksDB)
    try {
      val rocks = emitted(name)
      assert(rocks == default,
        s"$name: RocksDB-backed emission differs from the default store " +
          s"(${rocks.size} vs ${default.size} rows)")
      assert(default.nonEmpty, s"$name emitted no rows — vacuous parity")
    } finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  test("session windows emit identically under RocksDB state store") {
    parity("stream_session_state")
  }

  test("stream-stream inner join emits identically under RocksDB state store") {
    parity("stream_view_click_join")
  }

  test("stream-stream outer join emits identically under RocksDB state store") {
    parity("stream_view_click_outer")
  }

  test("streaming dedup emits identically under RocksDB state store") {
    parity("stream_ingest_dedup")
  }
}
