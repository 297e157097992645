package graft

/** Specs for round-5 batches R5h-R5i: ANOVA decomposition identity,
  * ALS closed-form, Jaccard bounds + non-edge contract, changepoint
  * argmax vs exhaustive scan, Kneser-Ney probability mass, HL pair
  * bound, OLS nesting (R² monotone), flow shares, proration totals.
  */
class R5hSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("stat_anova_f: SSB + SSW equals total SS and F is positive") {
    val Array((k, n, ssb, ssw, f)) =
      Queries.byName("stat_anova_f").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(k >= 2 && n > k)
    val cents = graft.engine.Engine.table(spark, sf, "events")
      .selectExpr("CAST(round(value * 100, 0) AS BIGINT) AS c")
      .as[Long].collect().map(BigInt(_)).toSeq
    val s1 = cents.sum; val s2 = cents.map(c => c * c).sum
    val sst = s2.toDouble - s1.toDouble * s1.toDouble / cents.size
    assert(math.abs((ssb + ssw) - sst) / sst < 1e-6,
      s"SSB($ssb)+SSW($ssw) must equal total SS ($sst)")
    assert(f > 0)
  }

  test("rec_als_rank1: item factor matches the closed-form on one part") {
    val rows = Queries.byName("rec_als_rank1").fn(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 25)
    val (p0, nRaters, v0) = rows.head
    val r = graft.engine.Engine.table(spark, sf, "lineitem")
      .join(graft.engine.Engine.table(spark, sf, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .selectExpr("o_custkey AS c", "l_partkey AS p",
        "CAST(round(l_quantity, 0) AS BIGINT) AS r")
      .as[(Long, Long, Long)].collect().toSeq
    val u = r.groupBy(_._1).map { case (c, rs) =>
      c -> math.round(rs.map(_._3).sum.toDouble / rs.size * 1e6)
    }
    val mine = r.filter(_._2 == p0)
    assert(mine.size == nRaters)
    val num = mine.map(x => x._3 * u(x._1)).sum
    val den = mine.map(x => u(x._1) * u(x._1)).sum
    assert(v0 == math.round(num.toDouble * 1e6 / den * 1e6))
  }

  test("g13_neighborhood_jaccard: scores in (0, 1e6], pairs not edges") {
    val rows = Queries.byName("g13_neighborhood_jaccard").fn(spark, sf)
      .select("a", "b", "common", "uni", "jaccard_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size <= 30)
    val edges = graft.operators.Graph.backbone(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // expected candidate count recomputed locally: distance-2 pairs
    // (shared neighbor, a < b) that are not themselves edges
    val und = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = und.groupBy(_._1).map { case (v, vw) => v -> vw.map(_._2).toSet }
    val expected = nbrs.keys.toSeq.sorted.combinations(2).count { pair =>
      val (a, b) = (pair(0), pair(1))
      (nbrs(a) & nbrs(b)).nonEmpty && !edges.contains((a, b))
    }
    assert(rows.size == math.min(expected, 30),
      s"query rows ${rows.size} vs locally recomputed $expected")
    rows.foreach { case (a, b, common, uni, jm) =>
      assert(a < b && common >= 1 && uni >= common)
      assert(jm > 0 && jm <= 1000000)
      assert(!edges.contains((a, b)), s"($a,$b) must not be an edge")
      assert(jm == math.round(common.toDouble * 1e6 / uni))
    }
  }

  test("stat_changepoint: split beats every other candidate split") {
    val Array((day, k, n, gain, ml, mr)) =
      Queries.byName("stat_changepoint").fn(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(k >= 1 && k < n && gain >= 0)
    val daily = graft.engine.Engine.table(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.date_format(
        $"o_orderdate", "yyyy-MM-dd").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("rev"))
      .orderBy("day")
      .as[(String, Long)].collect().toSeq
    assert(daily.size == n)
    val s = daily.map(_._2).sum.toDouble
    val gains = (1 until daily.size).map { i =>
      val pk = daily.take(i).map(_._2).sum.toDouble
      pk * pk / i + (s - pk) * (s - pk) / (daily.size - i) -
        s * s / daily.size
    }
    assert(math.abs(gains.max - gain) <= 1.0, "argmax must be global")
    assert(daily((k - 1).toInt)._1 == day)
    assert(ml != mr, "a detected changepoint should split distinct means")
  }

  test("text_kneser_ney: P(w2|w1) summed over seen w2 stays below 1") {
    val rows = Queries.byName("text_kneser_ney").fn(spark, sf)
      .select("a", "cab", "ca", "pkn_micro")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.size == 30)
    rows.foreach { case (_, cab, ca, p) =>
      assert(cab <= ca)
      assert(p > 0 && p <= 1000000)
      // discounting can only shrink the raw MLE mass, never exceed
      // the unsmoothed estimate plus the full continuation budget
      assert(p <= math.round(cab.toDouble / ca * 1e6) + 750000)
    }
  }

  test("stat_hodges_lehmann: per-nation shift lies inside the diff range") {
    val rows = Queries.byName("stat_hodges_lehmann").fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (nk, nPairs, shiftDeci) =>
      assert(nPairs >= 1)
      // acctbal spans [-999.99, 9999.99] → diffs in ±1,099,998 decicents
      assert(math.abs(shiftDeci) <= 11000000, s"nation $nk shift bound")
    }
  }

  test("stat_granger_lite: adding a regressor never lowers R²") {
    val Array((n, _, _, r2ar, r2full)) =
      Queries.byName("stat_granger_lite").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(n > 10)
    assert(r2ar >= 0 && r2full >= 0 && r2full <= 1000000)
    assert(r2full >= r2ar, "OLS R² is monotone in nested models")
  }

  test("seq_step_flow: shares sum to 1e6 per step (±rounding)") {
    val rows = Queries.byName("seq_step_flow").fn(spark, sf)
      .select("step", "share_micro").as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (step, ss) =>
      val total = ss.map(_._2).sum
      assert(math.abs(total - 1000000) <= ss.size,
        s"step $step shares must sum to ~1e6, got $total")
    }
  }

  test("j25_interval_allocate: proration conserves totals within rounding") {
    val rows = Queries.byName("j25_interval_allocate").fn(spark, sf)
      .select("month", "n_slices", "alloc_cents")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val allocated = rows.map(_._3).sum
    val total = graft.engine.Engine.table(spark, sf, "orders")
      .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c")
      .as[Long].collect().sum
    val nSlices = rows.map(_._2).sum
    // each slice rounds at most half a cent either way
    assert(math.abs(allocated - total) <= nSlices,
      s"allocated $allocated vs total $total (slices $nSlices)")
    assert(rows.map(_._1) == rows.map(_._1).sorted)
  }
}
