package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batches 31-33 (R4e-R4g): AUC vs brute-force pair
  * counting, calibration bin containment, gains-table identities, NDCG
  * bounds + DCG≤IDCG, label-prop count sanity, Markov argmax check,
  * EWMA vs a driver-side dot product, sentence-stat identities, and
  * feature-hash mass conservation.
  */
class R4egSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("auc: matches brute-force concordant-pair counting per segment") {
    val got = Queries.byName("ml_auc_rank").fn(spark, sf)
      .select("segment", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val raw = graft.engine.Engine.table(spark, sf, "orders")
      .join(graft.engine.Engine.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"),
        (col("o_orderstatus") === "F").cast("long"))
      .as[(String, Double, Long)].collect().toSeq
    got.foreach { case (seg, nPos, nNeg, auc) =>
      val xs = raw.filter(_._1 == seg)
      val pos = xs.filter(_._3 == 1L).map(_._2)
      val neg = xs.filter(_._3 == 0L).map(_._2)
      assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
      var num = 0.0
      for (p <- pos; n <- neg)
        num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      val brute = num / (nPos.toDouble * nNeg.toDouble)
      assert(math.abs(auc - brute) < 1e-5,
        s"$seg: rank AUC $auc != pairwise $brute")
    }
  }

  test("calibration: bins partition the orders and mean_p sits in-bin") {
    val rows = Queries.byName("ml_calibration").fn(spark, sf)
      .select("bin", "n", "n_pos", "mean_p", "frac_pos")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val total = graft.engine.Engine.table(spark, sf, "orders").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (bin, n, nPos, meanP, fracPos) =>
      assert(nPos <= n)
      assert(fracPos >= 0.0 && fracPos <= 1.0)
      val lo = bin / 10.0
      val hi = if (bin == 9) 1.0 + 1e-9 else (bin + 1) / 10.0
      assert(meanP >= lo - 1e-6 && meanP <= hi + 1e-6,
        s"bin $bin mean_p $meanP outside [$lo,$hi]")
    }
  }

  test("lift gains: cumulative identities and the all-data row is 1.0") {
    val rows = Queries.byName("ml_lift_gains").fn(spark, sf)
      .orderBy(desc("decile"))
      .select("decile", "n", "n_pos", "cum_n", "cum_pos", "cum_gain",
        "lift")
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rows.nonEmpty)
    // cum columns really are running sums in output order
    var (cn, cp) = (0L, 0L)
    rows.foreach { case (_, n, nPos, cumN, cumPos, _, _) =>
      cn += n; cp += nPos
      assert(cumN == cn && cumPos == cp)
    }
    val last = rows.last
    assert(math.abs(last._6 - 1.0) < 1e-9, "full-data gain must be 1")
    assert(math.abs(last._7 - 1.0) < 1e-9, "full-data lift must be 1")
    // gains never decrease as more deciles are included
    rows.map(_._6).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9)
      case _         =>
    }
  }

  test("rank metrics: ndcg bounded, dcg<=idcg, rr consistent with rank") {
    val rows = Queries.byName("eval_rank_metrics").fn(spark, sf)
      .select("q_id", "dcg_micro", "idcg_micro", "ndcg_micro",
        "first_rel_rank", "rr_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.length == 10)
    rows.foreach { case (q, dcg, idcg, ndcg, fr, rr) =>
      assert(dcg <= idcg, s"q$q: DCG $dcg > IDCG $idcg")
      assert(ndcg >= 0L && ndcg <= 1000000L)
      if (fr == 0L) assert(rr == 0L)
      else assert(rr == 1000000L / fr, s"q$q rr $rr != 1e6/$fr")
    }
  }

  test("label prop: counts bounded by the supplier universe") {
    val rows = Queries.byName("g8_label_prop").fn(spark, sf)
      .select("true_nat", "n_suppliers", "n_correct", "acc")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val nSup = graft.engine.Engine.table(spark, sf, "supplier").count()
    assert(rows.map(_._2).sum <= nSup)
    rows.foreach { case (_, n, c, acc) =>
      assert(c <= n && acc >= 0.0 && acc <= 1.0)
      assert(math.abs(acc - c.toDouble / n) < 1e-6)
    }
  }

  test("next event: the predictor really is the argmax of the counts") {
    val pred = Queries.byName("seq_next_event").fn(spark, sf)
      .select("prev", "predicted_next", "n_transitions", "n_correct")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(pred.nonEmpty)
    val trans = graft.engine.Engine.table(spark, sf, "events")
      .withColumn("prev", lag("event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("prev").isNotNull)
      .select(col("prev"), col("event_type").as("next"))
      .as[(String, String)].collect().toSeq
    val byPrev = trans.groupBy(_._1)
    pred.foreach { case (prev, hat, n, correct) =>
      val xs = byPrev(prev).map(_._2)
      assert(xs.length.toLong == n)
      val best = xs.groupBy(identity).map { case (k, v) =>
        (k, v.length)
      }.toSeq.sortBy { case (k, c) => (-c, k) }.head._1
      assert(hat == best, s"$prev: predicted $hat, argmax is $best")
      assert(correct == xs.count(_ == hat).toLong)
    }
  }

  test("ewma: matches a driver-side fixed-point dot product") {
    val rows = Queries.byName("w25_ewma").fn(spark, sf)
      .select("user_id", "day", "ewma_micro")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val (uid, day, got) = rows.head
    val series = graft.engine.Engine.table(spark, sf, "events")
      .filter(col("user_id") === uid)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("y"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("y"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val upto = series.filter(_._1 <= day).takeRight(10).map(_._2).reverse
    assert(upto.length == 10)
    val w = Seq(300000L, 210000L, 147000L, 102900L, 72030L,
      50421L, 35295L, 24706L, 17294L, 12106L)
    val expected = upto.zip(w).map { case (y, wk) => y * wk }.sum
    assert(got == expected, s"u$uid@$day: $got != $expected")
  }

  test("sentences: word totals dominate maxima and means are consistent") {
    val rows = Queries.byName("text_sentences").fn(spark, sf)
      .select("doc_id", "n_sentences", "n_words", "max_sent_words",
        "avg_sent_words")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (id, ns, nw, mx, avg) =>
      assert(mx <= nw, s"doc $id: max $mx > total $nw")
      if (ns > 0) {
        assert(nw >= ns, s"doc $id: fewer words than sentences")
        assert(math.abs(avg - nw.toDouble / ns) < 1e-5)
        assert(mx.toDouble >= avg - 1e-9)
      }
    }
  }

  test("feature hash: bucket masses conserve the corpus token count") {
    val rows = Queries.byName("ml_feature_hash").fn(spark, sf)
      .select("bucket", "total_tf", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, _, _) => b >= 0 && b < 64 })
    val totalToks = graft.engine.Engine.table(spark, sf, "documents")
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .filter(col("t") =!= "").count()
    assert(rows.map(_._2).sum == totalToks)
    rows.foreach { case (_, tf, nt) => assert(nt >= 1 && nt <= tf) }
  }
}
