package graft

/** Specs for round-5 batch R5r: Weibull fit coherence, Breusch-Pagan
  * first-stage consistency, suffix-profile structure.
  */
class R5rSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("seq_interpurchase_weibull: shape/scale positive, medians agree") {
    val Array((n, shape, scale, modelMed, obsMedDeci)) =
      Queries.byName("seq_interpurchase_weibull").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(n > 50, "needs a real gap sample")
    assert(shape > 0 && scale > 0)
    assert(modelMed > 0)
    // method-of-moments median should land within 3x of observed (log
    // moments are robust but not exact on skewed small samples)
    val obsMed = obsMedDeci / 10.0
    assert(modelMed < obsMed * 3 && modelMed > obsMed / 3,
      s"model median $modelMed vs observed $obsMed diverges wildly")
  }

  test("stat_breusch_pagan: LM stat non-negative, slope direction real") {
    val Array((n, slope, lm, flag)) =
      Queries.byName("stat_breusch_pagan").fn(spark, sf)
        .as[(Long, Long, Long, Long)].collect()
    assert(n > 1000)
    assert(lm >= 0)
    assert(flag == 0 || flag == 1)
    assert(slope != 0, "aux regression must detect some variance trend")
    // the flag must be exactly the 3.84 cut applied to the statistic
    assert((flag == 1) == (lm > 3841459L) ||
      math.abs(lm - 3841459L) <= 1,
      s"flag $flag inconsistent with lm $lm")
  }

  test("text_suffix_morphology: 5 ranked suffixes per language") {
    val rows = Queries.byName("text_suffix_morphology").fn(spark, sf)
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size).toSeq)
      assert(sorted.size <= 5)
      val ns = sorted.map(_._4)
      assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b },
        s"$lang suffix counts must be non-increasing")
      sorted.foreach { case (_, _, suf, _, share) =>
        assert(suf.length == 3)
        assert(share > 0 && share <= 1000000)
      }
    }
  }
}
