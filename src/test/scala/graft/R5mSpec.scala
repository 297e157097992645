package graft

/** Specs for round-5 batch R5m: FD-rule truths on the fixture, Gumbel
  * return-level ordering, modularity bounds and totals.
  */
class R5mSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("dq_fd_discovery: key-like rules hold, fan-out rules violate") {
    val rows = Queries.byName("dq_fd_discovery").fn(spark, sf)
      .select("rule", "n_lhs", "violating_lhs", "max_rhs_fanout", "holds")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 6)
    val byRule = rows.map(r => r._1 -> r).toMap
    // quantity varies per part — this FD must be violated on any
    // realistic fixture
    val pq = byRule("lineitem: partkey->quantity")
    assert(pq._5 == 0 && pq._3 > 0, "partkey->quantity cannot hold")
    rows.foreach { case (rule, nLhs, viol, fanout, holds) =>
      assert(nLhs > 0 && viol >= 0 && viol <= nLhs)
      assert(fanout >= 1)
      assert((holds == 1) == (viol == 0), s"$rule holds flag inconsistent")
    }
  }

  test("stat_gumbel_maxima: return levels increase with period") {
    val Array((n, mean, sd, mu, beta, rl12, rl60, rl120)) =
      Queries.byName("stat_gumbel_maxima").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 12, "needs multiple years of monthly maxima")
    assert(sd > 0 && beta > 0)
    assert(mu < mean, "Gumbel location sits below the mean")
    assert(rl12 < rl60 && rl60 < rl120,
      s"return levels must increase: $rl12, $rl60, $rl120")
    assert(rl12 > mean - sd, "12-month level near the typical maximum")
  }

  test("g16_modularity: contributions bounded, degrees sum to 2m") {
    val rows = Queries.byName("g16_modularity").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val m = graft.operators.Graph.backbone(spark, sf).count()
    assert(rows.map(_._3).sum == 2 * m, "degree sums must total 2m")
    assert(rows.map(_._2).sum <= m, "internal edges cannot exceed m")
    val q = rows.map(_._4).sum
    assert(q >= -1000000 && q <= 1000000,
      s"modularity total must lie in [-1, 1], got ${q / 1e6}")
    rows.foreach { case (_, eIn, dSum, _) =>
      assert(eIn >= 0 && dSum >= 1)
      assert(2 * eIn <= dSum, "internal edge ends are part of the degree")
    }
  }
}
