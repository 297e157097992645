package graft

import org.apache.spark.sql.functions._
import graft.engine.Scale

/** Skew + bucketing utilities: result correctness AND the plan property
  * each exists to provide.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: same results as plain join, fact spread over salts") {
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v") // 90% of rows share one key
    val dim = Seq(("hot", "H"), ("k950", "X")).toDF("key", "label")
    val plain = fact.join(dim, Seq("key"), "left")
      .select("key", "v", "label").orderBy("v").collect()
    val salted = Scale.saltedJoin(fact, dim, "key", col("v"), buckets = 8)
      .select("key", "v", "label").orderBy("v").collect()
    assert(salted.toSeq == plain.toSeq)
    // the hot key really is spread across salt buckets
    val spread = fact.withColumn("s", pmod(hash(col("v")), lit(8)))
      .filter($"key" === "hot").select("s").distinct().count()
    assert(spread > 4)
  }

  test("AQE splits the Zipf-skewed join at runtime (the unsalted production path)") {
    // j27_skew_salted grades the EXPLICIT salting path; this pins the
    // other half of the 100 TB skew story: with AQE left ON (the
    // production default — fixtureFloorConfs only disables it for
    // fixture-sized inputs), the SAME Zipf key is detected and split at
    // runtime by OptimizeSkewedJoin, no code changes. Thresholds are
    // lowered to make fixture-sized shuffle bytes cross the detection
    // bar; the assertion is the skew marker in the final adaptive plan.
    val was = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // the spec session's 2 shuffle partitions make skew statistics
      // meaningless (the hot key IS ~half of either partition's bytes);
      // 16 partitions give AQE a real median to compare against
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = graft.engine.Engine
        .table(spark, "/root/testdata/sf0.1", "events")
        .select(col("event_id"),
          floor(lit(100.0) / (col("user_id") % 100 + 1)).as("zkey"))
      // a PLAIN dim (no aggregation between its exchange and the join):
      // OptimizeSkewedJoin's ShuffleStage pattern requires Sort directly
      // over the shuffle stage on BOTH sides — an agg in between (the
      // j27 dim shape) structurally disqualifies the rule, which is
      // itself worth knowing: the salted path has no such precondition
      val dim = (0 until 100)
        .map(k => (k.toLong, s"label$k")).toDF("zkey", "label")
      val joined = fact.join(dim, Seq("zkey"), "left")
        .groupBy("label").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not mark the Zipf join skewed — either detection " +
          "thresholds drifted or OptimizeSkewedJoin stopped engaging:\n" +
          plan.take(1200))
    } finally was.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val orders = Engine2.ordersLike(spark)
      Scale.writeBucketed(orders, "b_orders", "custkey", 4)
      Scale.writeBucketed(orders.groupBy("custkey")
        .agg(sum("amount").as("total")), "b_totals", "custkey", 4)
      val joined = spark.table("b_orders").join(spark.table("b_totals"), "custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffled:\n" + plan.take(800))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_totals")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("partitioned parquet layout: a partition predicate prunes at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val df = (1 to 300).map(i => (i.toLong, s"d${i % 3}", i * 1.0))
      .toDF("id", "day", "v")
    graft.sources.Sinks.parquetPartitioned(df, dir, Seq("day"))
    val back = spark.read.parquet(dir).filter(col("day") === "d1")
    assert(back.count() === 100)
    val scan = back.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in plan"))
    // the day predicate must be a PARTITION filter (directory pruning —
    // never reaches row groups), not a data filter
    assert(scan.metadata("PartitionFilters").contains("day"),
      s"day not in PartitionFilters: ${scan.metadata("PartitionFilters")}")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 of 3 partition dirs scanned, got ${scan.selectedPartitions.partitionCount}")
  }

  test("geo_quadkey_join survives the broadcast→shuffle switch with identical values") {
    // the tile lookup carries NO broadcast hint — stats broadcast the
    // dim-sized index at fixture scale (PlanShapeSpec pins that), and
    // this is the 100 TB half of the claim: with broadcasting disabled
    // (a fact-sized supplier side), the SAME declarative plan runs as a
    // shuffle equi-join on the tile key and returns the identical rows
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.graft.floorScope", "false")
    try {
      val auto = Queries.byName("geo_quadkey_join").fn(spark, sf).collect().toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Queries.byName("geo_quadkey_join").fn(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "with broadcast disabled the tile lookup must become a shuffle join")
      assert(q.collect().toSeq == auto,
        "shuffle-join values diverged from the broadcast plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.graft.floorScope")
    }
  }
}

/** Tiny deterministic orders-like frame for bucketing tests. */
object Engine2 {
  def ordersLike(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (1 to 200).map(i => (i.toLong % 20, i.toLong, (i * 1.5)))
      .toDF("custkey", "orderkey", "amount")
  }
}
