package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.AsofJoin

/** Specs for the round-3 late batches (R3j–R3s): plan-shape assertions
  * for the star rollup and weighted sample, the as-of tie rule the
  * nearest join relies on, banded-ECDF equivalence for the KS test, and
  * invariants of the bootstrap and Lorenz outputs.
  */
class R3LateBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("j20 star rollup: all dimension joins broadcast") {
    val plan = Queries.byName("j20_star_rollup").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "a star dimension fell back to a shuffle join")
  }

  test("weighted sample: top-k via TakeOrdered, no global sort exchange") {
    val plan = Queries.byName("curate_weighted_sample").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy+limit did not collapse to TakeOrdered")
  }

  test("asof backward with negated rightOrder resolves ties to smallest key") {
    // two right rows at the same time for the same key: the merge's
    // last-wins traversal must carry okey 10, not 20, when ordered on
    // the negated key (the rule j21_asof_nearest pins its oracle to)
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, 20L), (1L, 3L, 10L), (1L, 1L, 7L))
      .toDF("k", "rt", "okey")
      .withColumn("okey_neg", -col("okey"))
    val out = AsofJoin.backward(left, right,
        keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
        carryCols = Seq("rt", "okey", "okey_neg"),
        rightOrder = Seq("okey_neg"))
      .select("asof_okey").as[Long].collect()
    assert(out.toSeq == Seq(10L))
  }

  test("ks test: banded ECDF argmax equals the global-window reference") {
    val banded = Queries.byName("stat_ks_test").fn(spark, sf).collect()(0)
    // reference: single global running-count window over per-value counts
    val vals = graft.engine.Engine.table(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100, 0).cast("long").as("v"),
        (col("event_type") === "click").cast("long").as("is1"))
    val perV = vals.groupBy("v")
      .agg(sum("is1").as("c1"), sum(lit(1L) - col("is1")).as("c2"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n1 = vals.agg(sum("is1")).as[Long].collect()(0)
    val n2 = vals.agg(sum(lit(1L) - col("is1"))).as[Long].collect()(0)
    val ref = perV
      .select(col("v"), sum("c1").over(w).as("f1"),
        sum("c2").over(w).as("f2"))
      .select(col("v"),
        abs(col("f1") * n2 - col("f2") * n1).as("d"))
      .orderBy(desc("d"), col("v")).limit(1)
      .collect()(0)
    assert(banded.getAs[Long]("d_num") == ref.getAs[Long]("d"))
    assert(banded.getAs[Long]("v_at") == ref.getAs[Long]("v"))
  }

  test("poisson bootstrap: CI ordered and weight shares near Poisson(1)") {
    val row = Queries.byName("stat_bootstrap_poisson").fn(spark, sf)
      .collect()(0)
    val (lo, hi) = (row.getAs[Long]("ci_lo_micro"),
      row.getAs[Long]("ci_hi_micro"))
    val mean = row.getAs[Long]("mean_full_micro")
    assert(lo <= hi, "CI bounds inverted")
    assert(lo <= mean && mean <= hi,
      "full-sample mean outside the 95% bootstrap CI")
  }

  test("lorenz: cumulative share monotone, reaches 100%, gini in [0,1]") {
    val rows = Queries.byName("stat_gini_lorenz").fn(spark, sf).collect()
    val shares = rows.map(_.getAs[Long]("cum_share_micro"))
    assert(shares.sameElements(shares.sorted), "Lorenz curve not monotone")
    assert(shares.last == 1000000L, "final cumulative share != 100%")
    val gini = rows.head.getAs[Long]("gini_micro")
    assert(gini >= 0L && gini <= 1000000L)
  }

  test("url canonicalization is idempotent over its own output") {
    // canonical(canonical(u)) == canonical(u): no scheme/ www./ query
    // markers survive the first pass
    val out = Queries.byName("dedup_url_canonical").fn(spark, sf)
      .select("canonical_url").as[String].collect()
    assert(out.nonEmpty)
    assert(out.forall(u => !u.contains("://") && !u.contains("?") &&
      !u.contains("#") && !u.startsWith("www.") && !u.endsWith("/") &&
      u == u.toLowerCase))
  }
}
