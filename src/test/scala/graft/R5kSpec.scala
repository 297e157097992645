package graft

/** Specs for round-5 batch R5k: MSTTR bounds, nearest-join optimality
  * on a brute-force re-check, packing-sweep fill monotonicity.
  */
class R5kSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("text_msttr: ratios in (0, 1e6], segment counts positive") {
    val rows = Queries.byName("text_msttr").fn(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nSeg, micro) =>
      assert(nSeg >= 1, s"$src must have full segments")
      assert(micro > 0 && micro <= 1000000, s"$src MSTTR out of range")
    }
  }

  test("j26_nearest_geo: matches brute-force argmin within the 3x3 reach") {
    val rows = Queries.byName("j26_nearest_geo").fn(spark, sf)
      .as[(Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(rows.nonEmpty)
    def coords(key: Long, nk: Long, kmod: Long) =
      ((nk * 7 % 180) - 90 + (key % 100) / 100.0 * 4,
        (nk * 13 % 360) - 180 + (key % 137) / 137.0 * 4)
    val cust = graft.engine.Engine.table(spark, sf, "customer")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Long)]
      .collect().filter(_._1 <= 200)
      .map { case (k, nk) => k -> coords(k, nk, 100) }.toMap
    val supp = graft.engine.Engine.table(spark, sf, "supplier")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Long)]
      .collect().map { case (k, nk) => k -> coords(k, nk, 100) }
    rows.foreach { case (ck, nearest, d2m, unmatched) =>
      val (clat, clon) = cust(ck)
      val inReach = supp.filter { case (_, (slat, slon)) =>
        math.floor(slat / 5) - math.floor(clat / 5) >= -1 &&
          math.floor(slat / 5) - math.floor(clat / 5) <= 1 &&
          math.floor(slon / 5) - math.floor(clon / 5) >= -1 &&
          math.floor(slon / 5) - math.floor(clon / 5) <= 1
      }
      if (inReach.isEmpty) {
        assert(unmatched == 1 && nearest.isEmpty)
      } else {
        assert(unmatched == 0)
        val best = inReach.map { case (sid, (slat, slon)) =>
          ((clat - slat) * (clat - slat) +
            (clon - slon) * (clon - slon), sid)
        }.min
        assert(nearest.contains(best._2),
          s"cust $ck nearest must be ${best._2}, got $nearest")
        assert(d2m.contains(math.round(best._1 * 1e6)))
      }
    }
  }

  test("curate_pack_efficiency: larger context never uses more bins") {
    val rows = Queries.byName("curate_pack_efficiency").fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(rows.map(_._1) == Seq(512L, 1024L, 2048L, 4096L))
    rows.foreach { case (_, nBins, total, fill, waste) =>
      assert(nBins > 0 && total > 0)
      assert(fill > 0 && fill <= 1000000)
      assert(math.abs(fill + waste - 1000000) <= 1)
    }
    val bins = rows.map(_._2)
    assert(bins.zip(bins.drop(1)).forall { case (a, b) => b <= a },
      s"bins must be non-increasing in context length: $bins")
    // truncation can only shrink token mass as ctx drops
    val toks = rows.map(_._3)
    assert(toks.zip(toks.drop(1)).forall { case (a, b) => b >= a },
      s"total packed tokens must be non-decreasing in ctx: $toks")
  }
}
