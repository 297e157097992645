package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 34 (R4h): boilerplate spans actually occur
  * verbatim in the documents that report them, forecast-baseline MAEs
  * vs a driver-side replay of the lag rules, and freshness-audit
  * integer identities.
  */
class R4hSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("boilerplate: reported spans re-count exactly by brute force") {
    // sf0.001 has few docs; run at a threshold the query fixes (>=3
    // docs) — recompute occurrences driver-side from raw text.
    val got = Queries.byName("curate_boilerplate").fn(spark, sf)
      .select("span", "n_docs", "n_occurrences", "doc_share")
      .as[(String, Long, Long, Double)].collect().toSeq
    val docs = graft.engine.Engine.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val nDocsTotal = docs.size
    def spans(text: String): Seq[String] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < 5) Seq.empty
      else (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" "))
    }
    val all = docs.flatMap { case (id, txt) => spans(txt).map(s => (s, id)) }
    val bydocs = all.groupBy(_._1)
    got.foreach { case (span, nd, occ, share) =>
      val hits = bydocs.getOrElse(span, Seq.empty)
      assert(hits.map(_._2).distinct.size.toLong == nd, s"span '$span'")
      assert(hits.size.toLong == occ, s"span '$span' occurrences")
      assert(nd >= 3)
      assert(math.abs(share - nd.toDouble / nDocsTotal) < 1e-5)
    }
    // top-50 really is the top: no unreported span beats the reported min
    if (got.size == 50) {
      val minKey = got.map { case (_, nd, occ, _) => (nd, occ) }
        .minBy { case (nd, occ) => (nd, occ) }
      val unreported = bydocs.view
        .filterKeys(k => !got.exists(_._1 == k)).toMap
      unreported.foreach { case (s, hits) =>
        val nd = hits.map(_._2).distinct.size.toLong
        if (nd >= 3) {
          val key = (nd, hits.size.toLong)
          assert(key._1 < minKey._1 ||
            (key._1 == minKey._1 && key._2 <= minKey._2),
            s"unreported span '$s' with $key beats reported min $minKey")
        }
      }
    }
  }

  test("forecast baselines: MAEs match a driver-side lag replay") {
    val got = Queries.byName("w27_forecast_baseline").fn(spark, sf)
      .select("user_id", "n_scored", "naive_mae", "snaive_mae", "winner")
      .as[(Long, Long, Double, Double, String)].collect().toSeq
    assert(got.nonEmpty)
    val daily = graft.engine.Engine.table(spark, sf, "events")
      .filter(col("user_id") % 10 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("y"))
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    got.foreach { case (uid, n, nm, sm, winner) =>
      val ys = daily(uid).toIndexedSeq
      val scored = (7 until ys.length).map { i =>
        (math.abs(ys(i) - ys(i - 1)), math.abs(ys(i) - ys(i - 7)))
      }
      assert(scored.size.toLong == n, s"user $uid n_scored")
      val naiveSum = scored.map(_._1).sum
      val snaiveSum = scored.map(_._2).sum
      assert(math.abs(nm - naiveSum.toDouble / n) < 1e-5, s"user $uid naive")
      assert(math.abs(sm - snaiveSum.toDouble / n) < 1e-5, s"user $uid snaive")
      val expWinner =
        if (snaiveSum < naiveSum) "seasonal"
        else if (snaiveSum > naiveSum) "naive" else "tie"
      assert(winner == expWinner, s"user $uid winner")
    }
  }

  test("freshness: integer identities and watermark consistency") {
    val got = Queries.byName("dq_freshness").fn(spark, sf)
      .select("event_type", "n_total", "last_day", "days_stale",
        "n_last7", "last7_share", "volume_collapsed")
      .as[(String, Long, String, Long, Long, Double, Boolean)]
      .collect().toSeq
    assert(got.nonEmpty)
    // exactly one type attains the corpus watermark (days_stale == 0)
    assert(got.exists(_._4 == 0L))
    val totalEvents = graft.engine.Engine.table(spark, sf, "events").count()
    assert(got.map(_._2).sum == totalEvents)
    got.foreach { case (et, n, _, stale, n7, share, collapsed) =>
      assert(stale >= 0, s"$et negative staleness")
      assert(n7 >= 0 && n7 <= n, s"$et n_last7 out of range")
      assert(math.abs(share - n7.toDouble / n) < 1e-5, s"$et share")
      assert(collapsed == (n7 * 52L < n), s"$et collapse flag")
    }
  }
}
