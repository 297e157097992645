package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Specs for round-3 batches 24-26 (R3x-R3z): KM monotonicity and
  * censoring bounds, rejection-sample flatness, seasonality share
  * identity, stump optimality vs brute force, Hill positivity, HITS
  * normalization invariants, and hapax bounds.
  */
class R3xyzSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("kaplan-meier: survival is monotone non-increasing from <= 1") {
    val s = Queries.byName("stat_survival_km").fn(spark, sf)
      .orderBy("dur_days").select("survival").as[Double].collect()
    assert(s.nonEmpty)
    assert(s.head <= 1.0 + 1e-9)
    s.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, s"S(t) increased: $a -> $b")
      case _ =>
    }
    assert(s.forall(v => v >= 0.0))
  }

  test("rejection sample: smallest source kept whole, others flattened to it") {
    val rows = Queries.byName("curate_rejection_sample").fn(spark, sf)
      .select("n_before", "accept_bp", "n_after")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nMin = rows.map(_._1).min
    rows.foreach { case (before, bp, after) =>
      assert(after <= before)
      if (before == nMin) assert(bp == 10000L, "min source must keep all")
      // accepted mass should land near the flat target (hash noise only;
      // generous 50% tolerance on tiny sf fixtures)
      assert(after <= before * bp / 10000 + before / 2 + 5)
    }
  }

  test("seasonality: per-type bp shares sum to ~7x10000") {
    val sums = Queries.byName("stat_seasonal_dow").fn(spark, sf)
      .groupBy("event_type").agg(sum("seasonal_bp").as("s"))
      .select("s").as[Long].collect()
    assert(sums.nonEmpty)
    // each of <=7 cells floors its div: total in [70000-7, 70000]
    sums.foreach(s => assert(s <= 70000L && s >= 70000L - 7L, s"sum=$s"))
  }

  test("gini split: reported split beats every other candidate (brute force)") {
    val best = Queries.byName("ml_gini_split").fn(spark, sf)
      .filter(col("feature") === "quantity")
      .select("threshold", "gini").as[(Long, Double)].collect()(0)
    // brute force on the driver at sf0.001
    val rows = graft.engine.Engine.table(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
      .as[(Long, Long)].collect()
    val n = rows.length.toDouble
    val cands = rows.map(_._1).distinct.sorted.dropRight(1)
    def wgini(thr: Long): Double = {
      val (l, r) = rows.partition(_._1 <= thr)
      def g(xs: Array[(Long, Long)]): Double = {
        val m = xs.length.toDouble
        val p = xs.count(_._2 == 1L) / m
        1.0 - p * p - (1 - p) * (1 - p)
      }
      (l.length * g(l) + r.length * g(r)) / n
    }
    val bruteBest = cands.map(c => (wgini(c), c)).min
    assert(math.abs(wgini(best._1) - bruteBest._1) < 1e-9,
      s"stump picked $best but brute force prefers $bruteBest")
  }

  test("hill estimator: alpha positive and threshold below the max") {
    val r = Queries.byName("stat_hill_tail").fn(spark, sf).collect()(0)
    val (k, thr, alpha) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(k > 0 && k <= 501)
    assert(alpha > 0.0, s"tail index must be positive, got $alpha")
    val mx = graft.engine.Engine.table(spark, sf, "orders")
      .agg(max(round(col("o_totalprice") * 100).cast("long")))
      .as[Long].collect()(0)
    assert(thr < mx)
  }

  test("hits: each side's top score is exactly Scale after normalization") {
    val out = Queries.byName("g7_hits").fn(spark, sf)
      .select("side", "rk", "score").as[(String, Long, Long)].collect()
    val bySide = out.groupBy(_._1)
    assert(bySide.keySet == Set("hub", "authority"))
    bySide.foreach { case (_, rows) =>
      val top = rows.minBy(_._2)
      assert(top._3 == Graph.Scale,
        s"max-normalized top score must equal Scale, got ${top._3}")
      rows.foreach { case (_, _, sc) =>
        assert(sc >= 0 && sc <= Graph.Scale)
      }
    }
  }

  test("hapax: hapax <= types <= tokens and ttr consistent") {
    val rows = Queries.byName("text_hapax").fn(spark, sf)
      .select("n_tokens", "n_types", "n_hapax", "ttr_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tok, ty, hap, ttr) =>
      assert(hap <= ty && ty <= tok)
      assert(ttr == ty * 10000 / tok)
    }
  }
}
