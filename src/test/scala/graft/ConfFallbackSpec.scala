package graft

import org.apache.spark.sql.functions._

/** Pins the round-11 conf-routed fallback paths: every opt-out must
  * produce the SAME graded rows as the optimized default, or the knob
  * is a correctness trap rather than a deployment lever.
  */
class ConfFallbackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    Queries.byName(name).fn(spark, sf).collect().map(_.toString).toSeq

  test("reportSortPartitions > 1 returns the identical globally-sorted rows") {
    val base = rows("stat_benford") // a reportSort-ending report query
    spark.conf.set("spark.graft.reportSortPartitions", "8")
    try {
      val parallel = rows("stat_benford")
      assert(parallel == base,
        "parallel range sort diverged from the single-partition sort")
    } finally spark.conf.unset("spark.graft.reportSortPartitions")
  }

  test("streamFileSink=true (manifest sink) grades identically to the plain sink") {
    QueriesR6a.clearResultMemo()
    val plain = rows("stream_hourly_rollup")
    spark.conf.set("spark.graft.streamFileSink", "true")
    QueriesR6a.clearResultMemo()
    try {
      val manifest = rows("stream_hourly_rollup")
      assert(manifest == plain, "manifest-sink rows diverged")
    } finally {
      spark.conf.unset("spark.graft.streamFileSink")
      QueriesR6a.clearResultMemo()
    }
  }

  test("fastLocalCheckpoints=false (default manager) grades identically") {
    QueriesR6a.clearResultMemo()
    val nio = rows("stream_ingest_dedup")
    spark.conf.set("spark.graft.fastLocalCheckpoints", "false")
    QueriesR6a.clearResultMemo()
    try {
      val default = rows("stream_ingest_dedup")
      assert(default == nio, "default-manager rows diverged")
    } finally {
      spark.conf.unset("spark.graft.fastLocalCheckpoints")
      QueriesR6a.clearResultMemo()
    }
  }

  test("streamScratchShm=false (tmpdir scratch) grades identically") {
    QueriesR6a.clearResultMemo()
    val shm = rows("stream_cdc_state")
    spark.conf.set("spark.graft.streamScratchShm", "false")
    QueriesR6a.clearResultMemo()
    try {
      val disk = rows("stream_cdc_state")
      assert(disk == shm, "tmpdir-scratch rows diverged")
    } finally {
      spark.conf.unset("spark.graft.streamScratchShm")
      QueriesR6a.clearResultMemo()
    }
  }

  test("reportSort plans: n=1 single exchange, n>1 range sort") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    val one = graft.engine.Ops.reportSort("k", "id")(df)
    assert(!one.queryExecution.executedPlan.toString.contains("rangepartitioning"),
      "n=1 must not range-partition")
    spark.conf.set("spark.graft.reportSortPartitions", "8")
    try {
      val par = graft.engine.Ops.reportSort("k", "id")(df)
      assert(par.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"),
        "n>1 must plan the parallel range sort")
    } finally spark.conf.unset("spark.graft.reportSortPartitions")
  }
}
