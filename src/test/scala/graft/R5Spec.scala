package graft

/** Specs for the round-5 query batches (R5a-R5e): rank-test structure,
  * graph-coefficient bounds, confusion-matrix consistency, exact
  * quantile location, wide-integer moment sums, Jaccard banding.
  */
class R5Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("w30_winsorized: bucketed quantile location matches a full sort") {
    val rows = Queries.byName("w30_winsorized").fn(spark, sf)
      .select("g", "n", "lo_cents", "hi_cents", "winsor_mean_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 3)
    val base = graft.engine.Engine.table(spark, sf, "lineitem")
      .selectExpr("l_returnflag AS g",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c")
      .as[(String, Long)].collect().toSeq.groupBy(_._1)
    rows.foreach { case (g, n, lo, hi, wmean) =>
      val sorted = base(g).map(_._2).sorted
      assert(n == sorted.size)
      val k5 = (5 * (n - 1)) / 100 + 1
      val k95 = (95 * (n - 1)) / 100 + 1
      assert(lo == sorted((k5 - 1).toInt), s"$g: p5 must be rank-$k5 value")
      assert(hi == sorted((k95 - 1).toInt), s"$g: p95 must be rank-$k95 value")
      val ref = math.round(
        sorted.map(c => math.max(lo, math.min(hi, c))).map(BigInt(_)).sum
          .toDouble / n)
      assert(wmean == ref, s"$g: winsorized mean mismatch")
      assert(lo <= hi && wmean >= lo && wmean <= hi)
    }
  }

  test("stat_jarque_bera: decimal moment sums are exact vs BigInt") {
    val rows = Queries.byName("stat_jarque_bera").fn(spark, sf)
      .select("g", "n", "skew_micro", "kurt_micro", "jb_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 3)
    val base = graft.engine.Engine.table(spark, sf, "lineitem")
      .selectExpr("l_returnflag AS g",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c")
      .as[(String, Long)].collect().toSeq.groupBy(_._1)
    rows.foreach { case (g, n, skM, kuM, jbM) =>
      val cs = base(g).map(c => BigInt(c._2))
      assert(n == cs.size)
      val (s1, s2, s3, s4) =
        (cs.sum, cs.map(c => c * c).sum, cs.map(c => c * c * c).sum,
          cs.map(c => c * c * c * c).sum)
      val nn = n.toDouble
      val mu = s1.toDouble / nn
      val m2 = s2.toDouble / nn - mu * mu
      val m3 = s3.toDouble / nn - 3.0 * mu * (s2.toDouble / nn) +
        2.0 * mu * mu * mu
      val m4 = s4.toDouble / nn - 4.0 * mu * (s3.toDouble / nn) +
        6.0 * mu * mu * (s2.toDouble / nn) - 3.0 * mu * mu * mu * mu
      val sk = m3 / (m2 * math.sqrt(m2))
      val ku = m4 / (m2 * m2) - 3.0
      assert(skM == math.round(sk * 1e6), s"$g skew")
      assert(kuM == math.round(ku * 1e6), s"$g kurt")
      assert(jbM == math.round(nn / 6.0 * (sk * sk + ku * ku / 4.0) * 1e6),
        s"$g jb")
    }
  }

  test("dedup_threshold_sweep: integer bands and per-band averages line up") {
    val rows = Queries.byName("dedup_threshold_sweep").fn(spark, sf)
      .select("jac_band", "n_pairs", "sum_jac_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty, "LSH must admit some candidate pairs")
    rows.foreach { case (band, nPairs, sumMicro) =>
      assert(band >= 0 && band <= 10)
      assert(nPairs >= 1)
      val avg = sumMicro.toDouble / nPairs
      // per-pair micro is round(1e6·j) with band = floor(10j): the band
      // average can sit at most half a micro-rounding outside the band
      assert(avg >= band * 1e5 - 1 && avg <= (band + 1) * 1e5 + 1,
        s"band $band average $avg outside band")
    }
  }

  test("stat_cramers_v: association strengths are valid and grids sized") {
    val rows = Queries.byName("stat_cramers_v").fn(spark, sf)
      .select("pair", "n", "r", "c", "v_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("mo_ls", "qb_rf", "rf_ls"))
    val nRows = graft.engine.Engine.table(spark, sf, "lineitem").count()
    rows.foreach { case (pair, n, r, c, v) =>
      assert(n == nRows, s"$pair must cover every row")
      assert(r >= 2 && c >= 2)
      assert(v >= 0 && v <= 1000000, s"$pair V=$v out of [0,1]")
    }
  }

  test("sim_isotropy: unit-vector geometry bounds hold") {
    val r = Queries.byName("sim_isotropy").fn(spark, sf)
      .select("n", "dim", "mean_norm_micro", "min_norm_micro",
        "max_norm_micro", "iso_pico")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (n, dim, meanN, minN, maxN, iso) = r
    assert(n > 0 && dim == 64)
    assert(minN <= meanN && meanN <= maxN)
    // ‖mean unit vector‖² ∈ [0, 1] — 1 only if all vectors are identical
    assert(iso >= 0 && iso <= 1000000000000L)
  }

  test("g12_clustering_coeff: triangles bounded by neighbor pairs") {
    val rows = Queries.byName("g12_clustering_coeff").fn(spark, sf)
      .select("node", "deg", "tri_cnt", "coeff_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 25)
    rows.foreach { case (node, deg, tri, coeff) =>
      assert(deg >= 2)
      assert(tri <= deg * (deg - 1) / 2,
        s"node $node: $tri triangles exceed pair space of degree $deg")
      assert(coeff >= 0 && coeff <= 1000000)
      assert(coeff == math.round(2.0 * tri / (deg.toDouble * (deg - 1)) * 1e6))
    }
    // descending by coefficient (tie-break on node)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
    }
  }

  test("ml_mcc_sweep: confusion rows conserve totals, MCC/F1 in range") {
    val rows = Queries.byName("ml_mcc_sweep").fn(spark, sf)
      .select("band", "tp", "fp", "fn", "tn", "mcc_micro", "f1_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size >= 5)
    val pos = rows.head._2 + rows.head._4
    val neg = rows.head._3 + rows.head._5
    rows.foreach { case (_, tp, fp, fn, tn, mcc, f1) =>
      assert(tp + fn == pos, "positive mass must be conserved")
      assert(fp + tn == neg, "negative mass must be conserved")
      assert(mcc >= -1000000 && mcc <= 1000000)
      assert(f1 >= 0 && f1 <= 1000000)
    }
    // cumulative-from-top: tp nondecreasing as band drops
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 > b._1 && a._2 <= b._2 && a._3 <= b._3)
    }
  }

  test("stat_mann_kendall / kruskal / g_test / mcnemar: test stats sane") {
    val mk = Queries.byName("stat_mann_kendall").fn(spark, sf)
      .select("g", "n", "s", "n_pairs").as[(String, Long, Long, Long)]
      .collect().toSeq
    assert(mk.nonEmpty)
    mk.foreach { case (_, n, s, np) =>
      assert(np == n * (n - 1) / 2, "pair space must be the full month grid")
      assert(math.abs(s) <= np)
    }
    val kw = Queries.byName("stat_kruskal_wallis").fn(spark, sf)
      .select("n_tot", "k", "h_micro", "h_corr_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(kw._2 == 3 && kw._3 >= 0 && kw._4 >= kw._3,
      "tie correction can only grow H")
    val mc = Queries.byName("stat_mcnemar").fn(spark, sf)
      .select("n", "b", "c", "chi2_micro").as[(Long, Long, Long, Long)]
      .collect().head
    assert(mc._2 + mc._3 <= mc._1 && mc._4 >= 0)
    val g = Queries.byName("stat_g_test").fn(spark, sf)
      .select("obs").as[Long].collect().toSeq
    val nOrders = graft.engine.Engine.table(spark, sf, "orders").count()
    assert(g.sum == nOrders, "G-test cells must partition orders")
  }

  test("g10/g11: assortativity in [-1,1], rich-club density monotone-ish") {
    val a = Queries.byName("g10_assortativity").fn(spark, sf)
      .select("m", "assort_micro").as[(Long, Long)].collect().head
    assert(a._1 > 0 && math.abs(a._2) <= 1000000)
    val rc = Queries.byName("g11_rich_club").fn(spark, sf)
      .collect()
    assert(rc.nonEmpty)
  }

  test("ml_pr_points / ml_brier_decomp: curve and decomposition invariants") {
    val pr = Queries.byName("ml_pr_points").fn(spark, sf).collect()
    assert(pr.nonEmpty)
    val schema = pr.head.schema.fieldNames.toSet
    // micro-quantized ratio columns stay in [0, 1e6]
    schema.filter(_.endsWith("_micro")).foreach { c =>
      pr.foreach { r =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000000, s"$c=$v out of ratio range")
      }
    }
    val bd = Queries.byName("ml_brier_decomp").fn(spark, sf).collect()
    assert(bd.nonEmpty)
  }

  test("R5b text batch: keyness, burstiness, drift, entropy rate run sane") {
    val ky = Queries.byName("text_keyness_g2").fn(spark, sf).collect()
    assert(ky.nonEmpty)
    val bu = Queries.byName("text_burstiness").fn(spark, sf).collect()
    assert(bu.nonEmpty)
    val js = Queries.byName("text_js_source_drift").fn(spark, sf).collect()
    assert(js.nonEmpty)
    val er = Queries.byName("seq_entropy_rate").fn(spark, sf).collect()
    assert(er.nonEmpty)
  }
}
