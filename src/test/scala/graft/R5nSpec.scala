package graft

/** Specs for round-5 batch R5n: SRM balance on a healthy mixer,
  * readability ranges, LSH s-curve dominance ordering.
  */
class R5nSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("stat_srm_check: mixer splits users near 50/50, no false alarm") {
    val Array((n, n1, n0, chi2, flag)) =
      Queries.byName("stat_srm_check").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(n == n1 + n0)
    assert(n1 > 0 && n0 > 0)
    // a healthy deterministic mixer must not trigger SRM on clean data
    assert(flag == 0, s"chi2=$chi2 flagged a balanced split")
    val imbalance = math.abs(n1 - n0).toDouble / n
    assert(imbalance < 0.1, s"mixer imbalance $imbalance too large")
  }

  test("text_readability: word/sentence/syllable sanity per source") {
    val rows = Queries.byName("text_readability").fn(spark, sf)
      .select("source", "n_docs", "words", "sentences", "syllables")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nd, w, sen, syl) =>
      assert(nd > 0 && w > 0 && sen >= nd, s"$src: ≥1 sentence per doc")
      assert(syl > 0 && syl >= w / 10, s"$src: syllable count implausible")
      assert(w > sen, s"$src: more words than sentences expected")
    }
  }

  test("dedup_lsh_planner: more bands = more candidates AND more recall") {
    val rows = Queries.byName("dedup_lsh_planner").fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(-_._1)
    assert(rows.map(r => (r._1, r._2)) == Seq((8L, 1L), (4L, 2L), (2L, 4L)))
    assert(rows.map(_._3).distinct.size == 1, "same pair panel everywhere")
    // banding with more bands (fewer rows) is strictly more permissive:
    // 1-(1-s^r)^b at fixed b*r grows as r shrinks, for s in (0,1)
    val cands = rows.map(_._4)
    assert(cands.zip(cands.drop(1)).forall { case (a, b) => a >= b },
      s"candidate volume must fall with rows_per_band: $cands")
    val recalls = rows.map(_._5)
    assert(recalls.zip(recalls.drop(1)).forall { case (a, b) => a >= b },
      s"recall must fall with rows_per_band: $recalls")
    recalls.foreach(r => assert(r >= 0 && r <= 1000000))
  }
}
