package graft

/** Specs for round-5 batch R5q: allocation budget conservation, Fleiss
  * kappa against the injected noise rate, IPS de-biasing identity.
  */
class R5qSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("curate_neyman_allocation: budget ~1000, shifts toward volatile") {
    val rows = Queries.byName("curate_neyman_allocation").fn(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val neyman = rows.map(_._4).sum
    val prop = rows.map(_._5).sum
    assert(math.abs(neyman - 1000) <= rows.size, s"Neyman budget $neyman")
    assert(math.abs(prop - 1000) <= rows.size, s"proportional budget $prop")
    rows.foreach { case (st, nh, sd, nn, np) =>
      assert(nh > 0 && sd > 0 && nn >= 0 && np >= 0, s"stratum $st")
    }
  }

  test("ml_fleiss_kappa: kappa well above chance for 80%-faithful raters") {
    val Array((nItems, pbar, pe, kappa)) =
      Queries.byName("ml_fleiss_kappa").fn(spark, sf)
        .as[(Long, Long, Long, Long)].collect()
    assert(nItems > 100)
    assert(pbar > pe, "observed agreement must beat chance")
    assert(kappa > 300000 && kappa <= 1000000,
      s"kappa $kappa implausible for 20% noise")
    assert(pe > 0 && pe < 1000000)
  }

  test("ml_position_bias_ips: IPS reconstructs position-0-scale clicks") {
    val rows = Queries.byName("ml_position_bias_ips").fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 10)
    val p0 = rows.find(_._1 == 0).get
    assert(p0._5 == 1000000, "position 0 propensity is the normalizer")
    rows.foreach { case (p, views, clicks, ctr, prop, ips) =>
      assert(views > 0 && clicks >= 0)
      assert(prop > 0)
      // ips_clicks = clicks/propensity = views * ctr0 — identical for
      // every position up to rounding: that IS the de-biasing identity
      val expected = math.round(
        views.toDouble * (p0._3.toDouble / p0._2))
      assert(math.abs(ips - expected) <= expected / 100 + 2,
        s"position $p ips $ips vs views*ctr0 $expected")
    }
  }
}
