package graft

/** Specs for round-4 batch 3 (R4p): RAKE phrase purity and score
  * accounting, blocking-eval metric bounds, cluster-sample caps.
  */
class R4pSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("text_keyphrase_rake: no stopwords inside phrases, positive scores") {
    val stops = Set("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    val rows = Queries.byName("text_keyphrase_rake").fn(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 20)
    rows.foreach { case (phrase, score, occ) =>
      assert(phrase.split(" ").forall(w => !stops.contains(w)),
        s"stopword leaked into phrase: $phrase")
      assert(score > 0 && occ >= 1)
    }
  }

  test("er_blocking_eval: metric bounds and pair arithmetic") {
    val r = Queries.byName("er_blocking_eval").fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    val (n, poss, cand, truth, found, pc, rr) = r
    assert(poss == n * (n - 1) / 2)
    assert(cand <= poss && cand >= 0)
    assert(found <= truth)
    assert(pc >= 0.0 && pc <= 1.0 && rr >= 0.0 && rr <= 1.0)
    // blocking on the first token must beat the cross product by a lot
    assert(rr > 0.5, s"reduction ratio $rr suspiciously low")
  }

  test("curate_cluster_sample: per-cluster cap and valid assignment") {
    val rows = Queries.byName("curate_cluster_sample").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cid, members) =>
      assert(cid >= 0 && cid < 8)
      assert(members.size <= 15, s"cluster $cid exceeded the 15-member cap")
      assert(members.map(_._2).sorted == (1L to members.size),
        s"cluster $cid picks not a 1..k prefix")
    }
    assert(rows.map(_._3).distinct.size == rows.size, "a vector sampled twice")
  }
}
