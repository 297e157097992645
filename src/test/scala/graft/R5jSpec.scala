package graft

/** Specs for round-5 batch R5j: Fisher-exact probability axioms,
  * k-center greedy invariants, boosting-stump gain consistency.
  */
class R5jSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("stat_fisher_exact: p in (0, 1], table margins consistent") {
    val Array((n, r1, c1, a, pMicro)) =
      Queries.byName("stat_fisher_exact").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(n > 0 && r1 <= n && c1 <= n)
    assert(a <= r1 && a <= c1)
    assert(pMicro > 0 && pMicro <= 1000000)
    // observed cell at (or above) independence expectation makes the
    // upper tail at most ~the cell's own hypergeometric mass + rest;
    // sanity: p must include at least P(X = a) > 0
  }

  test("curate_kcenter: 5 distinct centers, pick distances non-increasing") {
    val rows = Queries.byName("curate_kcenter").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 5)
    assert(rows.map(_._1).distinct.size == 5, "centers must be distinct")
    assert(rows.map(_._2) == Seq(1L, 2L, 3L, 4L, 5L))
    val picks = rows.map(_._3)
    assert(picks.head == 0L, "seed has d2 = 0")
    // greedy farthest-point distances never increase after round 2
    val tail = picks.drop(1)
    assert(tail.zip(tail.drop(1)).forall { case (x, y) => y <= x },
      s"pick distances must be non-increasing, got $tail")
    val cov = rows.map(_._4).distinct
    assert(cov.size == 1, "coverage radius is a single value")
    assert(cov.head <= tail.last,
      "final coverage cannot exceed the last pick distance")
  }

  test("ml_boost_stump: gain positive, MSE drops by gain/n") {
    val Array((splitLe, n, gain, lc, rc, mse0, mse1)) =
      Queries.byName("ml_boost_stump").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(splitLe >= 1 && n > 0)
    assert(gain > 0, "best split must reduce SSE")
    assert(mse1 < mse0, "MSE must drop after the split")
    assert(lc != rc, "a useful stump separates the leaf means")
    // mse0 - mse1 == gain / n up to the two roundings
    val lhs = mse0 - mse1
    val rhs = gain.toDouble / n
    assert(math.abs(lhs - rhs) <= 2.0,
      s"MSE drop $lhs must equal gain/n $rhs")
  }
}
