package graft

/** Specs for round-5 batch R5u: Katz vs degree coherence, KS bounds
  * vs a brute-force scan, boilerplate-effect consistency.
  */
class R5uSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("g17_katz_centrality: scores exceed base, top node is well-linked") {
    val rows = Queries.byName("g17_katz_centrality").fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 20)
    rows.foreach { case (_, katzM) =>
      assert(katzM >= 1000, "every node keeps at least the base weight")
    }
    val scores = rows.map(_._2)
    assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    // the top-katz node must be in the top decile by plain degree: katz
    // correlates with (but is not identical to) degree
    val deg = graft.operators.Graph.backbone(spark, sf)
      .selectExpr("a AS v").union(
        graft.operators.Graph.backbone(spark, sf).selectExpr("b AS v"))
      .groupBy("v").count().as[(Long, Long)].collect().toMap
    val topDeg = deg.values.toSeq.sorted.reverse
      .take(math.max(1, deg.size / 10)).last
    assert(deg(rows.head._1) >= topDeg,
      s"top Katz node ${rows.head._1} must sit in the top degree decile")
  }

  test("ml_ks_separation: matches brute-force max CDF gap") {
    val Array((thr, np, nn, ks)) =
      Queries.byName("ml_ks_separation").fn(spark, sf)
        .as[(Long, Long, Long, Long)].collect()
    val base = graft.engine.Engine.table(spark, sf, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)",
        "CAST(l_returnflag = 'R' AS INT)")
      .as[(Long, Int)].collect().toSeq
    assert(np == base.count(_._2 == 1) && nn == base.count(_._2 == 0))
    val byScore = base.groupBy(_._1).map { case (s, rs) =>
      (s, rs.count(_._2 == 1).toLong, rs.count(_._2 == 0).toLong)
    }.toSeq.sortBy(_._1)
    var cp = 0L; var cn = 0L; var best = -1L; var bestThr = Long.MaxValue
    byScore.foreach { case (s, p, n) =>
      cp += p; cn += n
      val gap = math.round(
        math.abs(cp.toDouble / np - cn.toDouble / nn) * 1e6)
      if (gap > best || (gap == best && s < bestThr)) {
        best = gap; bestThr = s
      }
    }
    assert(ks == best, s"KS $ks must equal brute-force $best")
    assert(thr == bestThr, s"threshold $thr must equal $bestThr")
  }

  test("curate_boilerplate_effect: shares bounded and internally consistent") {
    val rows = Queries.byName("curate_boilerplate_effect").fn(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, affected, spanShare, docShare) =>
      assert(affected <= nDocs, s"$src affected cannot exceed docs")
      assert(spanShare >= 0 && spanShare <= 1000000)
      assert(docShare >= 0 && docShare <= 1000000)
      assert((affected == 0) == (spanShare == 0),
        s"$src: zero affected docs iff zero boiler spans")
    }
  }
}
