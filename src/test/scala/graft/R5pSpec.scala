package graft

/** Specs for round-5 batch R5p: ξ bounds and direction asymmetry,
  * interval-coverage calibration band, joint-histogram marginals.
  */
class R5pSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("stat_xi_correlation: both directions bounded, count/revenue linked") {
    val rows = Queries.byName("stat_xi_correlation").fn(spark, sf)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) ==
      Seq("orders->revenue", "revenue->orders"))
    assert(rows.map(_._2).distinct.size == 1, "same day frame both ways")
    rows.foreach { case (dir, n, xi) =>
      assert(n > 100, s"$dir needs a real daily series")
      // ξ ∈ [-1/2, 1] asymptotically; with n large it can't leave [-1, 1]
      assert(xi >= -1000000 && xi <= 1000000, s"$dir xi out of range")
    }
    // daily revenue is nearly a function of daily order count (sum of
    // similar order values) — dependence must register clearly
    assert(rows.head._3 > 100000,
      s"orders->revenue xi=${rows.head._3} suspiciously low")
  }

  test("w31_interval_coverage: limits ordered, coverage near nominal") {
    val Array((nTr, nTe, q10, q90, cov, covMicro, nominal)) =
      Queries.byName("w31_interval_coverage").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(nTr > nTe, "80/20 chronological split")
    assert(q10 < q90, "P10 below P90")
    assert(cov <= nTe)
    assert(nominal == 800000L)
    // stationary residuals: held-out coverage within a generous band of
    // the nominal 80% (exact value is data-dependent, not asserted)
    assert(covMicro >= 500000 && covMicro <= 1000000,
      s"coverage $covMicro implausibly far from nominal")
  }

  test("curate_joint_histogram: marginal shares sum to 1e6 per band") {
    val rows = Queries.byName("curate_joint_histogram").fn(spark, sf)
      .select("len_band", "ttr_decile", "n_docs",
        "share_micro", "share_of_len_band_micro",
        "share_of_ttr_decile_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1000000) <= rows.size,
      "global shares must total ~1e6")
    rows.groupBy(_._1).foreach { case (band, rs) =>
      assert(math.abs(rs.map(_._5).sum - 1000000) <= rs.size,
        s"len band $band row-marginals must total ~1e6")
    }
    rows.groupBy(_._2).foreach { case (dec, rs) =>
      assert(math.abs(rs.map(_._6).sum - 1000000) <= rs.size,
        s"ttr decile $dec col-marginals must total ~1e6")
    }
  }
}
