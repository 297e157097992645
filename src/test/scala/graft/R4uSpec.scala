package graft

/** Specs for round-4 batch 8 (R4u): learning-curve nesting and fit
  * sanity, coverage-curve monotonicity and closure.
  */
class R4uSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("ml_learning_curve: train sets nest and R2 is bounded") {
    val rows = Queries.byName("ml_learning_curve").fn(spark, sf)
      .select("pct", "n_train", "r2_full")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(25L, 50L, 75L, 100L))
    // hash-threshold subsets must be strictly growing (nesting)
    rows.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._2) }
    rows.foreach { case (_, _, r2) =>
      assert(r2 <= 1.0 && !r2.isNaN)
    }
    // the 100% fit minimizes full-population SSE, so its R2 is the max
    val r2s = rows.map(_._3)
    assert(r2s.last >= r2s.max - 1e-9)
  }

  test("text_coverage_curve: coverage is monotone and ends at 1.0") {
    val rows = Queries.byName("text_coverage_curve").fn(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(3L, 5L, 10L, 20L, 30L))
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 < b._2, "cumulative occurrences must grow with k")
      assert(a._3 <= b._3)
    }
    rows.foreach { case (_, _, cov) => assert(cov > 0.0 && cov <= 1.0) }
    // k=30 of a 31-type vocabulary covers essentially everything
    assert(rows.last._3 > 0.9)
  }
}
