package graft

/** Specs for round-4 batch 7 (R4t): BH admission structure, split
  * leakage and mass conservation, gap-audit arithmetic.
  */
class R4tSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("stat_benjamini_hochberg: admission is a prefix in p-rank order") {
    val rows = Queries.byName("stat_benjamini_hochberg").fn(spark, sf)
      .select("rk", "p", "bh_bound", "significant")
      .as[(Long, Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(rows.size >= 20)
    // p nondecreasing in rank, bound strictly increasing
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2); assert(a._3 < b._3)
    }
    // significance must be a prefix: once false, never true again
    val sigFlags = rows.map(_._4)
    assert(!sigFlags.dropWhile(identity).contains(true),
      "BH admission must be a rank prefix")
    // the last admitted rank satisfies its own bound
    rows.filter(_._4).lastOption.foreach { r =>
      assert(r._2 <= r._3, "last admitted p must clear its BH bound")
    }
  }

  test("curate_heldout_split: zero leaks and full mass accounted") {
    val rows = Queries.byName("curate_heldout_split").fn(spark, sf)
      .select("source", "split", "n_docs", "tokens", "leaked_fps")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._5 == 0L), "cluster-keyed split can never leak")
    val nDocs = graft.engine.Engine.table(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "splits must partition the corpus")
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // train must dominate under an 80/10/10 hash split
    val bySplit = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
  }

  test("dq_sequence_gaps: every reported hole is real under the 1/7 drop") {
    val rows = Queries.byName("dq_sequence_gaps").fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 25)
    rows.foreach { case (after, missing) =>
      assert(missing >= 1)
      assert(after % 7 != 0, "gap_after itself must be a surviving id")
      // a single-id hole can only be a synthetic drop — a multiple of 7;
      // wider holes may also span ids absent from the fixture id space
      if (missing == 1) assert((after + 1) % 7 == 0,
        s"invented gap after $after")
    }
  }
}
