package graft

/** Specs for round-4 batch 6 (R4s): tolerance semantics, ROC curve
  * monotonicity, overlap symmetry convention, interleave density.
  */
class R4sSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("j24_asof_tolerance: staleness never exceeds tolerance, nulls paired") {
    val rows = Queries.byName("j24_asof_tolerance").fn(spark, sf)
      .select("view_id", "staleness_sec")
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (ord, stale) =>
      assert(ord.isDefined == stale.isDefined,
        "match fields must be null together")
      stale.foreach(sd => assert(sd >= 0 && sd <= 21600))
    }
    assert(rows.exists(_._1.isEmpty), "tolerance should discard something")
    assert(rows.exists(_._1.isDefined), "tolerance should keep something")
  }

  test("ml_roc_points: cumulative counts and rates are monotone") {
    val rows = Queries.byName("ml_roc_points").fn(spark, sf)
      .select("band", "cum_tp", "cum_fp", "tpr_micro", "fpr_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(-_._1) // highest band (threshold) first
    assert(rows.size >= 3)
    rows.sliding(2).foreach { case Seq(hi, lo) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3, "cumulative counts decreased")
    }
    val last = rows.last
    assert(last._4 == 1000000L && last._5 == 1000000L,
      "curve must end at (1, 1)")
  }

  test("curate_source_overlap: canonical pair order, positive counts") {
    val rows = Queries.byName("curate_source_overlap").fn(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n) =>
      assert(a <= b, "pairs must be canonicalized")
      assert(n >= 1)
    }
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
  }

  test("curate_quota_interleave: positions dense-ish and sources alternate") {
    val rows = Queries.byName("curate_quota_interleave").fn(spark, sf)
      .select("position", "source", "rk")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.nonEmpty && rows.size <= 40)
    assert(rows.map(_._1).distinct.size == rows.size, "position collision")
    // within any consecutive n_sources-sized window, no source repeats
    val nSources = rows.map(_._2).distinct.size
    rows.sliding(nSources).foreach { w =>
      assert(w.map(_._2).distinct.size == w.size,
        s"source repeated within one round: ${w.map(_._2)}")
    }
  }
}
