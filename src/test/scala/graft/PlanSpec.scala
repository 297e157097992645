package graft

import org.apache.spark.sql.functions._
import graft.engine.Engine

/** Physical-plan assertions for the 100 TB posture: filters reach the
  * parquet scan, projections prune the read schema, dimension joins
  * broadcast, and hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // floorScope off: plan assertions target the query's own physical plan,
  // not the checkpoint scan the scheduling-floor scope materializes
  private def planOf(name: String): String = {
    spark.conf.set("spark.graft.floorScope", "false")
    try Queries.byName(name).fn(spark, sf).queryExecution.executedPlan.toString
    finally spark.conf.unset("spark.graft.floorScope")
  }

  test("s2: filter pushed to parquet scan, read schema pruned") {
    val plan = planOf("s2_scan_project")
    assert(plan.contains("PushedFilters:") && !plan.contains("PushedFilters: []"),
      "no pushed filters on the scan")
    // only the 4 projected columns are read, not all 16
    assert(plan.contains("l_orderkey") && !plan.contains("l_comment"))
    assert(plan.contains("ReadSchema") &&
      !plan.split("ReadSchema")(1).split("\n")(0).contains("l_shipdate"),
      "scan reads columns the query never uses")
  }

  test("j1: dimension join is broadcast, not shuffle") {
    val plan = planOf("j1_broadcast_left_dim")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("pipe_enrich: all 11+ dimension joins broadcast; no SortMergeJoin") {
    // the graded query materializes inside its scoped AQE-off block (the
    // frame it returns is the checkpoint scan), so assert the join
    // strategy on the engine API over the same parquet-derived shapes
    val n = Engine.table(spark, sf, "nation")
    val day = to_date(lit("2024-01-01")).cast("timestamp")
    val fact = Engine.table(spark, sf, "customer").select(
      col("c_custkey").as("cid"), day.as("date"),
      col("c_name").as("home_team"), col("c_name").as("away_team"),
      concat(lit("R"), col("c_custkey") % 5).as("ref_name"))
    val teams = n.select(col("n_name").as("team"), lit(0.8).as("gk_rating"),
      lit(0.7).as("setpiece_rating"), lit(0.9).as("crowd_index"))
    val stad = n.select(col("n_name").as("team"),
      lit(1.0).as("lat"), lit(2.0).as("lon"))
    val refs = n.select(col("n_name").as("ref_name"),
      lit(0.2).as("ref_pen_rate"))
    val inj = n.select(day.as("date"), col("n_name").as("team"),
      lit(0.5).as("injury_index"))
    val lu = n.select(day.as("date"), col("n_name").as("team"),
      lit(1).as("key_att_out"), lit(0).as("key_def_out"),
      lit(1).as("keeper_changed"))
    val xg = n.select(col("n_name").as("team"),
      (col("n_nationkey") + 0.5).as("xg_hybrid"), lit(0.1).as("xga_hybrid"),
      lit(0.2).as("xgd_hybrid"), lit(0.3).as("xgd90_hybrid"))
    val nameMap = n.select(col("n_name").as("raw"),
      lower(col("n_name")).as("canonical"))
    val plan = graft.pipeline.Enrich
      .enrich(fact, teams, stad, refs, inj, lu, xg, nameMap)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "an enrichment dim join fell back to shuffle")
  }

  test("scan-heavy queries run inside whole-stage codegen") {
    spark.conf.set("spark.graft.floorScope", "false")
    try for (q <- Seq("f8_haversine", "f7_fractional_odds", "text_stats")) {
      val df = Queries.byName(q).fn(spark, sf)
      df.collect() // AQE only finalizes (and shows codegen spans) on execution
      val plan = df.queryExecution.executedPlan.toString
      // codegen'd spans render as "*(n) Operator" in the tree string
      assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
        s"$q dropped out of codegen")
    } finally spark.conf.unset("spark.graft.floorScope")
  }

  test("tfidf: no forced broadcast of the unbounded df aggregate") {
    // the vocabulary document-frequency table grows with the corpus — a
    // broadcast HINT would ship it to every executor at any size. The plan
    // must carry no hint; AQE may still pick broadcast from runtime stats.
    val analyzed = Queries.byName("text_tfidf_top").fn(spark, sf)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "df join carries a broadcast hint")
  }

  test("ivf: centroid pass and query probe are broadcast, never shuffled") {
    val plan = planOf("sim_ivf_topk")
    // 8 centroids → BroadcastNestedLoopJoin for assignment; 10 queries →
    // broadcast probe join. The corpus-side cell join may shuffle (it is
    // O(corpus) rows on both sides — the correct plan at scale).
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("curate_pack_shards aggregates map-side before the shuffle") {
    val plan = planOf("curate_pack_shards")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "no partial aggregation before the shuffle")
  }

  test("a5 aggregation does map-side partial aggregation") {
    val plan = planOf("a5_count_groups")
    // two HashAggregate nodes: partial (before exchange) + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "no partial aggregation before the shuffle")
  }

  test("stratified sample: rate table broadcasts; rank window partitioned") {
    val plan = planOf("curate_stratified_sample")
    assert(plan.contains("BroadcastHashJoin"), "rate table should broadcast")
    assert(!plan.contains("SortMergeJoin"))
    // the cap's row_number must never be a global (unpartitioned) window:
    // every windowspecdefinition must carry the stratum partition key
    // (collect on the executedPlan sees nothing under AQE's wrapper, so
    // assert on the plan string)
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("o_orderstatus")),
      s"cap rank runs as a global single-partition window: $specs")
  }

  test("kmeans update: centroid pass broadcast; dim-fold aggregates map-side") {
    val df = Queries.byName("sim_kmeans_update").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "centroids must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "no shuffled or cartesian join in the assignment pass")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "per-dimension means must partially aggregate before the exchange")
  }

  test("funnel: every stage keyed on user_id only — no second shuffle key") {
    val df = Queries.byName("w5_funnel").fn(spark, sf)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.toString
    }
    assert(exchanges.forall(_.contains("user_id")),
      s"funnel shuffles on a non-user key: $exchanges")
  }

  test("events reader rebuilds µs timestamps from nanos") {
    val df = Engine.table(spark, sf, "events")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.select(min(col("ts"))).collect()(0).getTimestamp(0) != null)
  }
}
