package graft

/** Plan-shape assertions for the round-5 stage-storm rewrites: the
  * wins were STRUCTURAL (no ranking windows, no per-branch job chains),
  * so the physical plans are asserted to keep them — a regression that
  * reintroduces a sort-based window or a join here is a perf bug even
  * while every value stays correct.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // floorScope off: these tests assert the query's OWN plan shape; the
  // scheduling-floor scope would hand back a checkpoint scan instead
  private def plan(name: String): String = {
    spark.conf.set("spark.graft.floorScope", "false")
    try Queries.byName(name).fn(spark, sf)
      .queryExecution.executedPlan.toString
    finally spark.conf.unset("spark.graft.floorScope")
  }

  test("er_survivorship: struct-ordered picks, no ranking window") {
    val p = plan("er_survivorship")
    assert(!p.contains("Window"),
      "survivorship must stay a two-level aggregation, not windows")
  }

  test("text_tfidf_top: associative top-1 pick, no ranking window") {
    val p = plan("text_tfidf_top")
    assert(!p.contains("Window"),
      "tf-idf top-1 must stay a struct-min aggregate, not a window sort")
  }

  test("stat_theil_sen: in-row generator, no self-join, no window") {
    val p = plan("stat_theil_sen")
    assert(!p.contains("Window"), "ranking windows were removed")
    assert(!p.toLowerCase.contains("sortmergejoin") &&
      !p.contains("BroadcastHashJoin"),
      "the pair space must enumerate inside the row, not via a join")
  }

  test("dq_ref_integrity: one tagged union, no join operators") {
    val p = plan("dq_ref_integrity")
    assert(!p.toLowerCase.contains("join"),
      "the FK audit must stay a union stream + keyed aggregation")
    assert(p.contains("Union"), "the tagged union is the plan's spine")
  }

  test("dq_pk_uniqueness: one union stream, no join operators") {
    val p = plan("dq_pk_uniqueness")
    assert(!p.toLowerCase.contains("join"),
      "the PK audit must stay a union stream + keyed aggregation")
    assert(p.contains("Union"))
  }

  test("sim_knn_label: banded-LSH candidates, no corpus×query cross join") {
    // VERDICT r11 task 1: the last O(n²) graded plan. With queries = 10%
    // of the corpus, ANY nested-loop/cartesian pairing is quadratic at
    // scale — candidate generation must stay a hash join on the banded
    // bucket key.
    val p = plan("sim_knn_label")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "kNN labeling must generate candidates via the banded-LSH bucket " +
        "join, never a corpus×query cross product")
  }

  test("j27_skew_salted: salt fan-out in the plan — salted key, exploded dim") {
    // VERDICT r11 task 2: the skew-join capability must be graded AND
    // structurally pinned — the join must run on (zkey, __salt) with the
    // dim side exploded across the salt sequence; losing either silently
    // reverts to the plain hot-key join the salting exists to prevent.
    val p = plan("j27_skew_salted")
    assert(p.contains("__salt"),
      "salted join must carry the __salt column into the join keys")
    assert(p.contains("Generate") || p.toLowerCase.contains("explode"),
      "dim side must explode the salt sequence (buckets-fold replication)")
  }

  test("j28_bucketed_join: bucketed scans, zero exchanges below the rollup") {
    // the bucketed layout's whole value: the per-customer agg rides the
    // scan's bucket partitioning and the fact-dim join is bucket-local.
    // Broadcasting disabled so the fixture-scale plan shows the same
    // structure a 100 TB run would: with it on, only the two expected
    // exchanges remain (the segment rollup + the report sort).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("j28_bucketed_join")
      assert("Bucketed: true".r.findAllIn(p).size == 2,
        "both sides must be bucketed scans:\n" + p.take(900))
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 2,
        s"expected exactly 2 exchanges (segment rollup + report sort), " +
          s"got $exchanges — the bucket-local agg/join re-shuffled:\n" +
          p.take(1200))
      assert(p.contains("SortMergeJoin"),
        "bucket-local join must be a sort-merge join when not broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
  }

  test("s10_partition_pruned: day predicate prunes 23 of 30 dirs at planning") {
    spark.conf.set("spark.graft.floorScope", "false")
    // AQE off in scope: the assertion digs the FileSourceScan out of the
    // physical leaves, and the adaptive wrapper hides them until runtime
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.byName("s10_partition_pruned").fn(spark, sf)
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScan in plan"))
      // the day bounds must be PARTITION filters (directory pruning —
      // no footer opened, no row read), not data filters
      assert(scan.metadata("PartitionFilters").contains("day"),
        s"day not a partition filter: ${scan.metadata("PartitionFilters")}")
      assert(scan.selectedPartitions.partitionCount === 7,
        s"expected 7 of 30 day dirs scanned, got " +
          s"${scan.selectedPartitions.partitionCount}")
      // the layout really has 30 day dirs — 23 are never read
      val dirs = new java.io.File(
        QueriesR13a.partitionedEventsDir(spark, sf))
        .listFiles().count(f => f.isDirectory && f.getName.startsWith("day="))
      assert(dirs === 30, s"expected 30 day= dirs in the layout, got $dirs")
      // one file per day dir: the repartition-by-key write discipline
      assert(scan.relation.location.inputFiles
        .count(_.contains("day=2024-01-08")) === 1,
        "each day dir must hold exactly one part file")
    } finally {
      spark.conf.unset("spark.graft.floorScope")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("geo_quadkey_join: broadcast tile lookup, no shuffle join") {
    val p = plan("geo_quadkey_join")
    assert(p.contains("BroadcastHashJoin"),
      "the expanded supplier tile index must broadcast (dim-sized)")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      "a fixture-scale tile lookup must never shuffle both sides")
  }
}
