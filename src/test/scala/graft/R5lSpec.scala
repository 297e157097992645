package graft

/** Specs for round-5 batch R5l: filter-sweep monotonicity, PPR mass
  * conservation bounds, Cochran-Armitage bounds, Hamming-rank order.
  */
class R5lSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("text_ppl_filter_sweep: retention monotone in the percentile cut") {
    val rows = Queries.byName("text_ppl_filter_sweep").fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(50L, 75L, 90L))
    val kept = rows.map(_._3)
    assert(kept.zip(kept.drop(1)).forall { case (a, b) => b >= a },
      s"higher percentile keeps at least as many docs: $kept")
    rows.foreach { case (pct, thr, n, share, meanLen) =>
      assert(thr > 0 && n > 0 && meanLen > 0)
      assert(share > 0 && share <= 1000000)
      // pXX keeps roughly XX% of docs (exact percentile => within ties)
      assert(share >= pct * 10000 - 50000 && share <= 1000000,
        s"p$pct share $share out of plausible band")
    }
  }

  test("g15_personalized_pagerank: seed ranks first, mass bounded") {
    val rows = Queries.byName("g15_personalized_pagerank").fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 20)
    val seed = graft.operators.Graph.backbone(spark, sf)
      .selectExpr("least(min(a), min(b))").as[Long].head()
    assert(rows.head._1 == seed,
      s"seed $seed must hold the top PPR rank, got ${rows.head._1}")
    assert(rows.head._2 >= rows.last._2)
    // total emitted mass cannot exceed the injected teleport+propagated
    // bound (1e6 scale, damping 0.85): sum over ALL nodes ≤ 1e6
    assert(rows.map(_._2).sum <= 1000000,
      "integer-floor PPR mass must stay within the seed's unit mass")
  }

  test("stat_cochran_armitage: z² positive, pbar a valid proportion") {
    val Array((k, nt, rt, pbar, z2)) =
      Queries.byName("stat_cochran_armitage").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(k == 5, "five priority tiers")
    assert(rt <= nt)
    assert(pbar > 0 && pbar < 1000000)
    assert(z2 >= 0)
  }

  test("sim_hamming_topk: per-query ranks ordered by distance") {
    val rows = Queries.byName("sim_hamming_topk").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size).toSeq)
      val dists = sorted.map(_._4)
      assert(dists.zip(dists.drop(1)).forall { case (a, b) => a <= b },
        s"query $q distances must be non-decreasing: $dists")
      assert(dists.forall(d => d >= 0 && d <= 16), "16-bit signatures")
      assert(!sorted.map(_._3).contains(q), "query never its own match")
    }
  }
}
