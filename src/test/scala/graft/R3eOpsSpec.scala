package graft

import org.apache.spark.sql.functions._

/** Semantic pins for round-3 batches 5-6: the pigeonhole banding
  * guarantee, the count-min one-sided error bound, token-budget greedy
  * structure, DSIR target preference, PQ code-shape invariants, and the
  * recall harness arithmetic.
  */
class R3eOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Queries.byName(name).fn(spark, sf)

  test("pigeonhole: Hamming<=3 over 32 bits forces agreement on a band") {
    // pure property of the 4x8-bit banding the query relies on: flipping
    // at most 3 of 32 bits cannot touch all 4 disjoint bands
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextLong() & 0xffffffffL
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val y = (1 to flips).foldLeft(x)((v, _) => v ^ (1L << rnd.nextInt(32)))
      val agree = (0 until 4).exists(b =>
        ((x >> (8 * b)) & 0xff) == ((y >> (8 * b)) & 0xff))
      assert(agree, s"x=$x y=$y flips=$flips")
    }
  }

  test("dedup_hamming_band: pairs are canonical, unique, within threshold") {
    val rows = run("dedup_hamming_band")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, h) => a < b && h >= 0 && h <= 2 })
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("text_countmin: estimates never undercount (CMS one-sided bound)") {
    val rows = run("text_countmin")
      .select("exact", "cm_est", "never_under").as[(Long, Long, Boolean)]
      .collect()
    assert(rows.length === 20)
    assert(rows.forall { case (exact, est, flag) => est >= exact && flag })
  }

  test("curate_token_budget: fits budget; higher bands fully selected") {
    val sel = run("curate_token_budget")
      .select("doc_id", "n_toks", "band").as[(Long, Long, Long)].collect()
    assert(sel.map(_._2).sum <= 20000L)
    // greedy structure: if any doc of band b is in, every band above b
    // is taken whole
    val selectedBands = sel.map(_._3).toSet
    val minSelected = selectedBands.min
    val allByBand = graft.engine.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        (expr("size(array_distinct(toks)) * 1000000") /
          size(col("toks"))).cast("long").as("sm"))
      .select(col("doc_id"), (col("sm") / 100000).cast("long").as("band"))
      .groupBy("band").count().as[(Long, Long)].collect().toMap
    val selByBand = sel.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    allByBand.keys.filter(_ > minSelected).foreach { b =>
      assert(selByBand.getOrElse(b, 0L) === allByBand(b),
        s"band $b not fully selected above boundary band $minSelected")
    }
  }

  test("curate_dsir: target-language docs score highest per token") {
    val scored = run("curate_dsir")
    val docs = graft.engine.Engine.table(spark, sf, "documents")
      .select("doc_id", "lang")
    val byLang = scored.join(docs, "doc_id")
      .groupBy("lang")
      .agg(avg(col("score_micro").cast("double") / col("n_toks")).as("m"))
      .as[(String, Double)].collect().toMap
    val others = byLang.filter(_._1 != "en").values
    assert(others.nonEmpty && byLang("en") > others.max)
  }

  test("sim_pq_codes: 8 packed nibbles, ids < 16, nonneg error") {
    val rows = run("sim_pq_codes")
      .select("pq_code", "err_micro").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (code, err) =>
      assert(err >= 0L)
      assert(code >= 0L && code < (1L << 32))
      (0 until 8).foreach(j => assert(((code >> (4 * j)) & 0xf) < 16))
    }
    // codebook vectors quantize to themselves: zero reconstruction error
    val self = run("sim_pq_codes").filter(col("vec_id") < 16)
      .select("vec_id", "err_micro").as[(Long, Long)].collect()
    assert(self.length === 16)
    assert(self.forall(_._2 === 0L))
  }

  test("sim_pq_adc: 5 ranked candidates per query, monotone distances") {
    val rows = run("sim_pq_adc")
      .select("q_id", "rank", "adc_micro").as[(Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 10)
    byQ.values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val byRank = g.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      assert(g.forall(_._3 >= 0L))
    }
  }

  test("eval_minhash_err: estimator bounded, error is |est - exact|") {
    val rows = run("eval_minhash_err")
      .select("jacc_micro", "est_micro", "err_micro")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (j, e, err) =>
      assert(j >= 0L && j <= 1000000L)
      assert(e >= 0L && e <= 1000000L && e % 62500 === 0L)
      assert(err === math.abs(e - j))
    }
  }

  test("dq_rules_report: pk_unique catches the fixture defect, rest pass") {
    val rows = run("dq_rules_report")
      .select("rule", "violations", "pass").as[(String, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.size === 8)
    rows.foreach { case (_, (v, p)) => assert(p === (v === 0L)) }
    assert(!rows("pk_unique")._2) // duplicate (orderkey, linenumber) pairs
    assert(rows("fk_orders_orphans")._2 && rows("quantity_range")._2)
  }

  test("sim_ann_recall: hits in [0,5], recall_pct = 20*hits, 10 queries") {
    val rows = run("sim_ann_recall")
      .select("q_id", "hits", "recall_pct").as[(Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (_, h, p) =>
      assert(h >= 0L && h <= 5L && p === h * 20)
    }
    // nprobe=1 on 8 cells still finds SOME true neighbors overall
    assert(rows.map(_._2).sum > 0L)
  }
}
