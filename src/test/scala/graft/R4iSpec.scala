package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 36 (R4i): drawdown vs a driver-side replay
  * of the running peak, Mann-Whitney U vs brute-force pair counting,
  * and aHash popcount/bucket identities.
  */
class R4iSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("drawdown: matches a driver-side running-peak replay") {
    val got = Queries.byName("w28_drawdown").fn(spark, sf)
      .select("user_id", "n_days", "peak_daily", "max_drawdown",
        "drawdown_day")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.nonEmpty)
    val daily = graft.engine.Engine.table(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("y"))
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    got.foreach { case (uid, n, peak, maxDd, ddDay) =>
      val series = daily(uid)
      assert(series.size.toLong == n)
      assert(series.map(_._3).max == peak)
      var runPeak = Long.MinValue
      val dds = series.map { case (_, day, y) =>
        runPeak = math.max(runPeak, y)
        (day, runPeak - y)
      }
      val expMax = dds.map(_._2).max
      assert(maxDd == expMax, s"user $uid max drawdown")
      assert(ddDay == dds.find(_._2 == expMax).get._1, s"user $uid day")
    }
  }

  test("mann-whitney: U matches brute-force pair counting") {
    val got = Queries.byName("stat_mann_whitney").fn(spark, sf)
      .select("seg", "n1", "n2", "u1_x2", "u1", "z")
      .as[(String, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got.nonEmpty)
    val base = graft.engine.Engine.table(spark, sf, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .join(graft.engine.Engine.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"),
        (col("o_orderstatus") === "F"))
      .as[(String, Double, Boolean)].collect().toSeq
      .groupBy(_._1)
    got.foreach { case (seg, n1, n2, u1x2, u1, z) =>
      val xs = base(seg)
      val f = xs.filter(_._3).map(_._2)
      val o = xs.filterNot(_._3).map(_._2)
      assert(f.size.toLong == n1 && o.size.toLong == n2)
      // U1 = #(f > o) + 0.5 * #(f == o), in doubled units
      val u1x2Brute = f.iterator.map { x =>
        o.count(y => x > y).toLong * 2 + o.count(y => x == y).toLong
      }.sum
      assert(u1x2 == u1x2Brute, s"$seg: $u1x2 != brute $u1x2Brute")
      assert(math.abs(u1 - u1x2Brute / 2.0) < 1e-6)
      // z is finite and centered: |z| can't exceed the no-variance bound
      z.foreach(v => assert(!v.isNaN && !v.isInfinite))
    }
  }

  test("ahash: popcount identity and bucket occupancy conservation") {
    val got = Queries.byName("mm_image_ahash").fn(spark, sf)
      .select("doc_id", "ahash_lo", "ahash_hi", "n_set", "bucket",
        "bucket_size")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (id, lo, hi, nSet, bucket, _) =>
      assert(lo >= 0 && lo < (1L << 32), s"doc $id lo out of range")
      assert(hi >= 0 && hi < (1L << 32), s"doc $id hi out of range")
      assert(java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)
        == nSet, s"doc $id popcount")
      assert(bucket == (hi >> 24), s"doc $id bucket")
      // replay the pixel synthesis + threshold
      val px = (0 until 64).map(j => (id * 131071L + j * 40503L) % 256L)
      val total = px.sum
      val bits = px.map(p => p * 64L > total)
      val expLo = (0 until 32).map(j =>
        if (bits(j)) 1L << j else 0L).sum
      val expHi = (32 until 64).map(j =>
        if (bits(j)) 1L << (j - 32) else 0L).sum
      assert(lo == expLo && hi == expHi, s"doc $id hash replay")
    }
    // bucket sizes: every member of a bucket reports the same size, and
    // sizes partition the corpus
    val byBucket = got.groupBy(_._5)
    byBucket.foreach { case (b, rows) =>
      assert(rows.map(_._6).distinct == Seq(rows.size.toLong),
        s"bucket $b size mismatch")
    }
    assert(byBucket.values.map(_.size).sum == got.size)
  }
}
