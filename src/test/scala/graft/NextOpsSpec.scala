package graft

import org.apache.spark.sql.functions._

/** Plan + value assertions for the late-round-2 tier (QueriesNext):
  * the banded interval join must never plan a nested loop, the
  * decontamination probe must broadcast only the eval side, the planted
  * near-dup pass must recover plants through the LSH buckets, and the
  * frame sampler must round-trip the container byte layout.
  */
class NextOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    Queries.byName(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("j16: banding turns the interval overlap into a pure equi-join") {
    val plan = planOf("j16_interval_overlap")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "interval overlap planned as a nested loop — banding key didn't take")
  }

  test("contamination: eval shingles broadcast; corpus never shuffles on the gram key") {
    val plan = planOf("curate_contamination")
    assert(plan.contains("BroadcastHashJoin"), "eval shingle set must broadcast")
    // exactly one gram-key exchange is acceptable: the EVAL-side distinct,
    // which shuffles only benchmark shingles (MBs at any corpus size). A
    // second one would mean the corpus gram stream itself shuffles —
    // O(total corpus shingles) over the wire. doc_id exchanges (per-doc
    // aggregation) are the operator's natural shuffle.
    // (assert on the plan string: tree collect sees nothing under AQE)
    val gramExchanges =
      "Exchange hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq
        .filterNot(_.contains("doc_id"))
    assert(gramExchanges.size <= 1,
      s"corpus gram stream shuffled on the gram key: $gramExchanges")
  }

  test("embedding near-dup recovers only planted pairs, via buckets not cross join") {
    val plan = planOf("dedup_embedding_cosine")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "near-dup pair generation fell back to the cross product")
    val rows = Queries.byName("dedup_embedding_cosine").fn(spark, sf).collect()
    assert(rows.nonEmpty, "no planted near-dup recovered — threshold pass is vacuous")
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 1000000000000L),
      "a non-planted pair crossed the 0.95 threshold")
  }

  test("w7 lag/lead runs in exactly one hash shuffle, keyed on user_id") {
    // rangepartitioning from the final presentation orderBy is expected;
    // the window itself must cost exactly one user_id hash exchange
    val plan = planOf("w7_lag_lead")
    val hashEx = "Exchange hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("user_id"),
      s"lag/lead needs one user_id hash exchange, found: $hashEx")
  }

  test("a15 grouping sets aggregate in ONE pass (single Expand, partial agg)") {
    val plan = planOf("a15_grouping_sets")
    assert("Expand".r.findAllIn(plan).size >= 1, "grouping sets lost the Expand")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "no partial aggregation before the exchange")
  }

  test("a16 typed top-k partially aggregates map-side") {
    val plan = planOf("a16_topk_agg")
    // ObjectHashAggregate partial + final: the shuffle carries ≤k-row
    // buffers per map-side group, not the raw rows
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "typed aggregator shuffles raw rows instead of partial buffers")
  }

  test("scd2: every window keyed on the customer — no global window, no self-join") {
    val plan = planOf("p10_scd2_history")
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("o_custkey")),
      s"an SCD2 window runs unpartitioned (single-partition sort): $specs")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "SCD2 build should be windows over one keyed stream, not a history self-join")
  }

  test("upsert merge applies U/D/I exactly: deletes gone, inserts present, rest kept") {
    val rows = Queries.byName("p11_upsert_merge").fn(spark, sf).collect()
    val byKey = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byKey.keys.forall(k => k >= 1000000000000L || k % 11 != 0), "a deleted key survived")
    assert(byKey.filter(_._1 >= 1000000000000L).values.forall(_ == "inserted"))
    assert(byKey.filter { case (k, _) => k < 1000000000000L && k % 11 != 0 && k % 7 == 0 }
      .values.forall(_ == "updated"), "a matched update row kept its base values")
    assert(byKey.filter { case (k, _) => k < 1000000000000L && k % 11 != 0 && k % 7 != 0 }
      .values.forall(_ == "kept"))
  }

  test("histogram aggregates map-side; shuffle carries only bucket rows") {
    val plan = planOf("a17_histogram")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "no partial aggregation before the exchange")
  }

  test("pageRankInt: hand-computed ranks on a 3-node star, both checkpoint parities") {
    import spark.implicits._
    // a→b, a→c, b→a, c→a: deg(a)=2, deg(b)=deg(c)=1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    // r1(a) = 150000 + 850·(10^6 + 10^6) div 1000; r1(b) = 150000 + 850·(10^6 div 2) div 1000
    val r1 = graft.operators.Graph.pageRankInt(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // iters=2 exercises the i%2==0 checkpoint path (iters=1 the i==iters one)
    val r2 = graft.operators.Graph.pageRankInt(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("pageRankInt: symmetricEdges fast path == default on a symmetrized graph") {
    import spark.implicits._
    // random-ish multigraph, symmetrized the way g1/textrank build edges
    val fwd = (1 to 60).map(i => ((i % 13).toLong, (i * 7 % 11 + 20).toLong))
      .distinct.filter { case (a, b) => a != b }
    val both = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val slow = graft.operators.Graph.pageRankInt(both, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = graft.operators.Graph.pageRankInt(both, iters,
          assumeDistinct = true, symmetricEdges = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == slow, s"iters=$iters")
    }
  }

  test("pageRankInt: a source node with no in-edges holds the base rank") {
    import spark.implicits._
    // 1↔2 plus a pure source 3→1: node 3 never receives mass
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = graft.operators.Graph.pageRankInt(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1(1) = 150000 + 850·(10^6 + 10^6) div 1000; r1(2) gets 1's full rank;
    // r1(3) = bare base 150000 via the precomputed no-in-edge frame
    assert(r1 == Map(1L -> 1850000L, 2L -> 1000000L, 3L -> 150000L))
    val r2 = graft.operators.Graph.pageRankInt(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r2(1) = 150000 + 850·(r1(2) + r1(3)) div 1000 = 150000 + 977500
    // r2(2) = 150000 + 850·r1(1) div 1000 = 150000 + 1572500
    assert(r2 == Map(1L -> 1127500L, 2L -> 1722500L, 3L -> 150000L))
  }

  test("frame sampler round-trips the container layout byte-exactly") {
    val rows = Queries.byName("mm_frame_sample").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, f, off, v) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
      assert(f % 3 == 0, "sampled a non-stride frame")
      assert(off == 9 + f * 4, "byte offset drifted from the container layout")
      assert(v == (docId * 1000003L + f * 97) % 4294967296L,
        s"frame bytes corrupted for doc $docId frame $f")
    }
  }
}
