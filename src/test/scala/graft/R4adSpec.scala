package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batches 27-30 (R4a-R4d): leave-one-out no-leak
  * property, P/R/F1 confusion identities, kappa formula consistency,
  * rolling-slope against a driver-side fit, VAD segment identities, MMR
  * selection invariants, k-fold leakage guarantee, STL reconstruction,
  * RRF bounds, and manifest order-insensitivity.
  */
class R4adSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("target encode: row's own label never leaks into its encoding") {
    val enc = Queries.byName("ml_target_encode").fn(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "pos",
        "loo_rate_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    // brute-force the group stats on the driver at sf0.001
    val all = graft.engine.Engine.table(spark, sf, "lineitem")
      .select(col("l_suppkey"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
      .as[(Long, Long)].collect()
    val byKey = all.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val (nAll, pAll) = (all.length.toLong, all.map(_._2).sum)
    enc.take(50).foreach { case (_, _, sk, pos, bp) =>
      val (n, p) = byKey(sk)
      val expected =
        if (n > 1) (p - pos) * 10000 / (n - 1)
        else (pAll - pos) * 10000 / (nAll - 1)
      assert(bp == expected, s"suppkey=$sk pos=$pos: $bp != $expected")
    }
  }

  test("prf: confusion identities and f1 between precision and recall") {
    val rows = Queries.byName("ml_prf_metrics").fn(spark, sf)
      .select("tp", "fp", "fn", "prec_bp", "rec_bp", "f1_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    val nDocs = graft.engine.Engine.table(spark, sf, "documents").count()
    rows.foreach { case (tp, fp, fn, p, r, f1) =>
      assert(tp + fp + fn <= nDocs)
      assert(f1 >= math.min(p, r) - 1 && f1 <= math.max(p, r) + 1,
        s"F1 $f1 outside [min,max] of P=$p R=$r")
    }
    // the two classes' fp/fn mirror each other
    assert(rows(0)._2 == rows(1)._3 && rows(0)._3 == rows(1)._2)
  }

  test("kappa: consistent with po/pe and bounded above by 1") {
    val r = Queries.byName("stat_cohens_kappa").fn(spark, sf).collect()(0)
    val (po, pe, k) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(k <= 1.0 + 1e-9)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-3,
      "kappa inconsistent with its own po/pe (beyond rounding)")
  }

  test("rolling slope: matches a driver-side least-squares fit") {
    val row = Queries.byName("w24_rolling_slope").fn(spark, sf)
      .orderBy("user_id", "day").limit(1)
      .select("user_id", "day", "slope_14d")
      .collect()(0)
    val (uid, day) = (row.getLong(0), row.getString(1))
    val ys = graft.engine.Engine.table(spark, sf, "events")
      .filter(col("user_id") === uid)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("y"))
      .filter(date_format(col("d"), "yyyy-MM-dd") <= day)
      .orderBy(desc("d")).limit(14)
      .orderBy("d").select("y").as[Long].collect()
      .map(_.toDouble)
    assert(ys.length == 14)
    val xs = (1 to 14).map(_.toDouble)
    val (mx, my) = (xs.sum / 14, ys.sum / 14)
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(row.getDouble(2) - slope) < 1e-5)
  }

  test("runs test: runs count bounded by sequence length") {
    val r = Queries.byName("stat_runs_test").fn(spark, sf).collect()(0)
    val (runs, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(runs >= 1 && runs <= n1 + n2)
    assert(runs <= 2 * math.min(n1, n2) + 1,
      "more runs than alternation allows")
  }

  test("vad: segment totals consistent per doc") {
    val rows = Queries.byName("mm_vad_segments").fn(spark, sf)
      .select("n_voice", "n_segments", "longest_run")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, s, l) =>
      assert(v <= 32 && l <= v)
      assert(s == 0L && v == 0L || (s >= 1 && l >= 1 && v >= s))
      if (s > 0) assert(l * s >= v / s, "degenerate run accounting")
    }
  }

  test("mmr: five distinct picks, first is pure-relevance argmax") {
    val rows = Queries.byName("text_mmr_diversify").fn(spark, sf)
      .orderBy("rank").select("rank", "doc_id", "rel", "maxsim", "mmr")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._2).distinct.length == 5, "duplicate doc selected")
    assert(rows(0)._4 == 0L, "first pick must have no similarity penalty")
    assert(rows(0)._5 == rows(0)._3 * 7)
    rows.tail.foreach(r => assert(r._5 == r._3 * 7 - r._4 * 3))
  }

  test("k-fold: zero groups straddle folds and folds partition the rows") {
    val rows = Queries.byName("ml_kfold_assign").fn(spark, sf)
      .select("n_rows", "groups_split").as[(Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, gs) => assert(gs == 0L) }
    val total = graft.engine.Engine.table(spark, sf, "orders").count()
    assert(rows.map(_._1).sum == total)
  }

  test("stl: trend + seasonal + residual reconstructs y") {
    val rows = Queries.byName("w26_stl_lite").fn(spark, sf)
      .select("y", "trend", "seasonal", "residual").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val recon = r.getDouble(1) + r.getDouble(2) + r.getDouble(3)
      assert(math.abs(recon - r.getLong(0)) < 1e-4,
        s"decomposition does not reconstruct: $recon vs ${r.getLong(0)}")
    }
  }

  test("rrf: scores bounded by the two best-rank contributions") {
    val rows = Queries.byName("sim_rrf_fusion").fn(spark, sf)
      .select("rrf_micro").as[Long].collect()
    assert(rows.length == 20)
    val maxPossible = 2 * (1000000L / 61)
    rows.foreach(s => assert(s > 0 && s <= maxPossible))
  }

  test("shard manifest: checksums invariant under repartitioning") {
    val q = Queries.byName("curate_shard_manifest")
    val base = q.fn(spark, sf).collect().map(_.toSeq).toSeq
    // same computation over a shuffled/re-partitioned input path: the
    // bit_xor fold must not care about order or partitioning
    val docs = graft.engine.Engine.table(spark, sf, "documents")
      .repartition(13, col("n_chars"))
    val again = docs
      .select((graft.operators.Dedup.tokenId(col("doc_id").cast("string"))
        % 16L).as("shard"),
        col("n_chars"), graft.operators.Dedup.tokenId(col("text")).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("total_chars"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(base == again)
  }
}
