package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 37 (R4k): Theil-Sen vs a driver-side
  * pairwise-slope median, weighted-median threshold invariants, and
  * row-digest drift localization (F diverges, O/P certify identical).
  */
class R4kSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("theil-sen: slope equals driver-side lower-median of pair slopes") {
    val got = Queries.byName("stat_theil_sen").fn(spark, sf)
      .select("user_id", "n_days", "n_pairs", "ts_slope")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val daily = graft.engine.Engine.table(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("user_id"), col("day").cast("string"), col("y"))
      .as[(Long, String, Long)].collect().toSeq.groupBy(_._1)
    import java.time.LocalDate
    got.foreach { case (uid, nDays, nPairs, slope) =>
      val recent = daily(uid).sortBy(_._2).takeRight(15)
      assert(recent.size.toLong == nDays)
      val pts = recent.map { case (_, d, y) =>
        (LocalDate.parse(d).toEpochDay, y) }
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if i < j
      } yield ((pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1), pts(i)._1, pts(j)._1))
        .sortBy(p => (p._1, p._2, p._3))
      assert(slopes.size.toLong == nPairs, s"user $uid pair count")
      val lowerMedian = slopes((slopes.size + 1) / 2 - 1)._1
      assert(math.abs(slope - lowerMedian) < 1e-5,
        s"user $uid: $slope != $lowerMedian")
    }
  }

  test("weighted median: threshold rule holds on both sides") {
    val got = Queries.byName("a27_weighted_median").fn(spark, sf)
      .select("event_type", "n_events", "total_w", "w_median_value",
        "cum_at_median")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got.nonEmpty)
    val base = graft.engine.Engine.table(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("long"))
      .as[(String, Long, Double, Long)].collect().toSeq.groupBy(_._1)
    got.foreach { case (et, n, totW, medV, cumAt) =>
      val xs = base(et).sortBy(r => (r._3, r._2))
      assert(xs.size.toLong == n)
      assert(xs.map(_._4).sum == totW)
      // replay: first row whose cumulative weight crosses half
      var cum = 0L
      val hit = xs.find { r => cum += r._4; cum * 2 >= totW }.get
      assert(hit._3 == medV, s"$et median value")
      assert(cum == cumAt || xs.takeWhile(_ != hit).map(_._4).sum + hit._4 == cumAt)
      // mass below the median value is < half; mass up to it is >= half
      val below = xs.filter(_._3 < medV).map(_._4).sum
      val upTo = xs.filter(_._3 <= medV).map(_._4).sum
      assert(below * 2 < totW, s"$et too much mass below")
      assert(upTo * 2 >= totW, s"$et not enough mass up to median")
    }
  }

  test("row digest: drift pinned to F, O/P certified in sync") {
    val got = Queries.byName("dq_row_digest").fn(spark, sf)
      .select("status", "n_a", "n_b", "digest_a", "digest_b", "in_sync")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(_._1)
    assert(got.map(_._1) == Seq("F", "O", "P"))
    got.foreach { case (st, na, nb, da, db, sync) =>
      assert(na == nb, s"$st counts must match (shift keeps rows)")
      if (st == "F") {
        assert(!sync && da != db, "F must show drift")
      } else {
        assert(sync && da == db, s"$st must be in sync")
      }
    }
    // digest is order-insensitive: xor-fold of per-row hashes driver-side
    val rows = graft.engine.Engine.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd"))
      .as[(Long, String, String)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def rowHash(k: Long, day: String, st: String): Long = {
      val hex = md.digest(s"$k|$day|$st".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = rows.groupBy(_._2).view.mapValues(
      _.map(r => rowHash(r._1, r._3, r._2)).reduce(_ ^ _)).toMap
    got.foreach { case (st, _, _, da, _, _) =>
      assert(da == expected(st), s"$st digest vs driver-side xor-fold")
    }
  }
}
