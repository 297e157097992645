package graft

import org.apache.spark.sql.functions.col
import graft.tools.FloorCheck

/** Reliable-checkpoint mode (VERDICT r8 task 1): one conf —
  * `spark.graft.reliableCheckpoint=true` — flips every plan-truncation
  * site (Graph.pageRankInt / hitsInt / bfsHops, Dedup.connectedComponents,
  * the BPE loop, query-level reuse materializations, the floor scope) from
  * executor-local checkpoints to durable `Dataset.checkpoint`, so a
  * cluster run survives executor loss instead of dying on "checkpoint
  * block not found". This spec pins:
  *   - VALUES: one graded query per iterative family returns bit-identical
  *     rows in reliable mode vs default mode at sf0.001;
  *   - MECHANISM: the frame an iterative operator returns in reliable mode
  *     is backed by a genuinely RELIABLY-checkpointed RDD (checkpoint FILE
  *     present — not a local checkpoint, whose blocks die with executors).
  */
class ReliableCheckpointSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Canonical row set for one graded query under the given mode, reusing
    * FloorCheck's rendering so the comparison discipline is identical to
    * the parity ratchet.
    */
  private def rows(name: String, reliableMode: Boolean): Seq[String] = {
    val was = spark.conf.getOption(graft.engine.Ck.ReliableKey)
    spark.conf.set(graft.engine.Ck.ReliableKey, reliableMode.toString)
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = SparkEntry.queries(name)(spark, sf)
      val ordered = df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      val out = ordered.collect()
        .map(r => r.toSeq.map(FloorCheck.renderCell).mkString("|")).toSeq.sorted
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      out
    } finally was match {
      case Some(v) => spark.conf.set(graft.engine.Ck.ReliableKey, v)
      case None    => spark.conf.unset(graft.engine.Ck.ReliableKey)
    }
  }

  // one representative per iterative family: pageRankInt, hitsInt,
  // connectedComponents (dedup path + the blocked-ER path), BPE loop
  private val representatives = Seq(
    "g1_pagerank", "g7_hits", "dedup_components", "er_name_cluster",
    "text_bpe_train3")

  representatives.foreach { name =>
    test(s"$name: reliable-checkpoint mode returns identical rows") {
      val local = rows(name, reliableMode = false)
      val reliable = rows(name, reliableMode = true)
      assert(local.nonEmpty, s"$name returned no rows — vacuous parity")
      assert(reliable == local,
        s"$name diverged across checkpoint modes (" +
          s"local=${local.size} rows, reliable=${reliable.size} rows)")
    }
  }

  test("reliable mode durably checkpoints the returned iterative frame") {
    spark.conf.set(graft.engine.Ck.ReliableKey, "true")
    try {
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
        .toDF("src", "dst")
      val ranks = graft.operators.Graph.pageRankInt(edges, iters = 2, parts = 2)
      val rdd = graft.operators.Iterate.checkpointRdd(ranks)
        .getOrElse(fail("pageRankInt result is not checkpoint-backed"))
      assert(rdd.isCheckpointed, "returned RDD is not checkpointed")
      assert(rdd.getCheckpointFile.isDefined,
        "no checkpoint FILE — a local checkpoint, not a reliable one")
      // and the values are still the PageRank the default mode computes
      assert(ranks.count() == 4)
    } finally spark.conf.unset(graft.engine.Ck.ReliableKey)
  }

  test("default mode stays on executor-local checkpoints (no files)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = graft.operators.Graph.pageRankInt(edges, iters = 1, parts = 2)
    val rdd = graft.operators.Iterate.checkpointRdd(ranks)
      .getOrElse(fail("pageRankInt result is not checkpoint-backed"))
    assert(rdd.getCheckpointFile.isEmpty,
      "default mode wrote checkpoint files — reliable mode leaked on")
  }
}
