package graft

/** Specs for round-4 batch 5 (R4r): perplexity bounds under smoothing,
  * TOST/Welch identity checks, rate-test arithmetic, embedding audit
  * invariants.
  */
class R4rSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("seq_markov_perplexity: positive bits, bounded by log2 of grid") {
    val rows = Queries.byName("seq_markov_perplexity").fn(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 20)
    rows.foreach { case (_, n, bits) =>
      assert(n >= 5)
      assert(bits > 0.0)
      // add-one smoothing bounds any single step's surprisal by
      // log2(total+|types|); with <=5 types and the fixture's volume a
      // per-step mean above 30 bits is impossible
      assert(bits < 30.0, s"implausible surprisal $bits")
    }
  }

  test("stat_tost_equivalence: one-sided statistics bracket the mean diff") {
    val r = Queries.byName("stat_tost_equivalence").fn(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].head()
    val (n1, n2, diff, margin, tLo, tHi, eq) = r
    assert(n1 > 1 && n2 > 1)
    assert(margin > 0.0)
    // t_lower tests diff > -margin, t_upper tests diff < +margin
    assert(tLo > tHi, "shifting by +margin must give the larger statistic")
    if (eq) assert(tLo > 1.64 && tHi < -1.64)
  }

  test("stat_poisson_rate_test: z matches the count arithmetic") {
    val (k1, k2, n, z, ratio, _) =
      Queries.byName("stat_poisson_rate_test").fn(spark, sf)
        .as[(Long, Long, Long, Double, Double, Boolean)].head()
    assert(n == k1 + k2)
    val expZ = (k1.toDouble - n / 2.0) / math.sqrt(n / 4.0)
    assert(math.abs(z - expZ) < 1e-4)
    assert(math.abs(ratio - k1.toDouble / k2) < 1e-4)
  }

  test("dq_embedding_audit: clean fixture => square dims, finite norms") {
    val rows = Queries.byName("dq_embedding_audit").fn(spark, sf)
      .select("label", "n_vecs", "dim_min", "dim_max", "norm_min",
        "norm_max", "nonfinite_components")
      .as[(Int, Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, dmin, dmax, nmin, nmax, bad) =>
      assert(n > 0)
      assert(dmin == dmax, "fixture embeddings should be rectangular")
      assert(nmin >= 0.0 && nmax >= nmin)
      assert(bad == 0L, "fixture should have no NaN/Inf components")
    }
  }
}
