package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 38 (R4l): PIT feature no-leakage replay,
  * conductance identities (cut symmetry, vol conservation, φ bounds),
  * and Holt coefficients vs a driver-side float recursion.
  */
class R4lSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("pit feature join: trailing window replay, no future leakage") {
    val got = Queries.byName("j23_pit_feature_join").fn(spark, sf)
      .select("user_id", "day", "n_purchases", "clicks_7d")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val ev = graft.engine.Engine.table(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).cast("string"))
      .as[(Long, String, String)].collect().toSeq
    import java.time.LocalDate
    val clicksByUser = ev.filter(_._2 == "click")
      .groupBy(_._1).view.mapValues(_.map(r => LocalDate.parse(r._3))).toMap
    val purchases = ev.filter(_._2 == "purchase")
      .groupBy(r => (r._1, r._3)).view.mapValues(_.size).toMap
    assert(got.size == purchases.size, "one row per (user, purchase day)")
    got.foreach { case (uid, day, nP, c7) =>
      assert(purchases((uid, day)).toLong == nP)
      val d = LocalDate.parse(day)
      val exp = clicksByUser.getOrElse(uid, Seq.empty).count { cd =>
        !cd.isAfter(d) && cd.isAfter(d.minusDays(7))
      }
      assert(c7 == exp.toLong, s"user $uid day $day: $c7 != $exp")
    }
  }

  test("conductance: cut symmetry, volume conservation, bounds") {
    val got = Queries.byName("g9_conductance").fn(spark, sf)
      .select("community", "n_nodes", "vol", "cut", "conductance")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got.nonEmpty)
    // total volume = 2|E| of the backbone; each cut edge counted once
    // per side, so Σcut is even
    assert(got.map(_._4).sum % 2 == 0, "cut total must be even")
    val totalVol = got.map(_._3).sum
    assert(totalVol % 2 == 0, "handshake: total volume even")
    got.foreach { case (c, nNodes, vol, cut, phiOpt) =>
      assert(nNodes >= 1 && vol >= nNodes, s"community $c degenerate")
      assert(cut <= vol, s"community $c cut exceeds volume")
      val denom = math.min(vol, totalVol - vol)
      if (denom > 0) {
        val phi = phiOpt.get
        assert(math.abs(phi - cut.toDouble / denom) < 1e-6)
        assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"community $c φ=$phi")
      } else {
        assert(phiOpt.isEmpty, s"community $c: φ must be null when " +
          "the cut denominator is 0")
        assert(cut == 0, s"community $c: sole community cannot cut")
      }
    }
  }

  test("holt: dyadic dot product equals a driver-side recursion") {
    // coefficient sanity: level coefficients sum to 1, trend to 0
    assert(QueriesR4l.holtLevelNum.sum == QueriesR4l.holtDen)
    assert(QueriesR4l.holtTrendNum.sum == 0L)
    val got = Queries.byName("w29_holt_point").fn(spark, sf)
      .select("user_id", "level", "trend", "forecast_next")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    val daily = graft.engine.Engine.table(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("user_id"), col("day").cast("string"), col("y"))
      .as[(Long, String, Long)].collect().toSeq.groupBy(_._1)
    got.foreach { case (uid, level, trend, fc) =>
      val ys = daily(uid).sortBy(_._2).takeRight(10).map(_._3.toDouble)
      assert(ys.size == 10)
      var l = ys(0)
      var b = ys(1) - ys(0)
      for (i <- 1 until 10) {
        val lNew = 0.5 * ys(i) + 0.5 * (l + b)
        b = 0.25 * (lNew - l) + 0.75 * b
        l = lNew
      }
      assert(math.abs(level - l) < 1e-5, s"user $uid level $level != $l")
      assert(math.abs(trend - b) < 1e-5, s"user $uid trend $trend != $b")
      assert(math.abs(fc - (l + b)) < 1e-5, s"user $uid forecast")
    }
  }
}
