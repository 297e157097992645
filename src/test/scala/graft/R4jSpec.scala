package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 36 (R4j): PSI identities (shares sum to 1,
  * total = Σ contributions, sign structure), Spearman vs a driver-side
  * tie-averaged rank computation, and the power-iteration step vs a
  * dense driver-side matrix product.
  */
class R4jSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("psi: smoothed shares sum to ~1 and total equals contributions") {
    val got = Queries.byName("stat_psi_drift").fn(spark, sf)
      .select("bin", "n_base", "n_cur", "p_base", "p_cur",
        "psi_contrib", "psi_total")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.nonEmpty)
    val k = got.size
    // smoothing: each observed bin adds 0.5, so shares sum to 1 exactly
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4, "base shares")
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4, "cur shares")
    val totals = got.map(_._7).distinct
    assert(totals.size == 1)
    assert(math.abs(totals.head - got.map(_._6).sum) < 1e-4 * k,
      "psi_total vs contribution sum")
    // every contribution is non-negative: (p2-p1)*ln(p2/p1) >= 0
    got.foreach { case (bin, _, _, _, _, c, _) =>
      assert(c >= -1e-9, s"bin $bin negative PSI contribution")
    }
    // counts partition the orders table
    val n = graft.engine.Engine.table(spark, sf, "orders").count()
    assert(got.map(r => r._2 + r._3).sum == n)
  }

  test("spearman: rho matches driver-side tie-averaged ranks") {
    val got = Queries.byName("stat_spearman").fn(spark, sf)
      .select("flag", "n", "rho", "t_stat")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    val base = graft.engine.Engine.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
      .as[(String, Double, Double)].collect().toSeq.groupBy(_._1)
    def avgRanks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1) }
      sorted.groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2).sum.toDouble / xs.size
      }
    }
    got.foreach { case (flag, n, rho, tStat) =>
      val xs = base(flag)
      assert(xs.size.toLong == n)
      val rx = avgRanks(xs.map(_._2))
      val ry = avgRanks(xs.map(_._3))
      val pairs = xs.map(r => (rx(r._2), ry(r._3)))
      val mx = pairs.map(_._1).sum / n
      val my = pairs.map(_._2).sum / n
      val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
      val expRho = cov / math.sqrt(vx * vy)
      assert(math.abs(rho - expRho) < 1e-5, s"$flag: $rho != $expRho")
      val expT = expRho * math.sqrt((n - 2.0) / (1.0 - expRho * expRho))
      assert(math.abs(tStat - expT) < 1e-4, s"$flag t_stat")
    }
  }

  test("pca power step: matches a dense driver-side XtXv product") {
    val got = Queries.byName("ml_pca_power").fn(spark, sf)
      .select("dim", "w_raw", "w_unit", "lambda0")
      .as[(Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size == 64)
    val rows = graft.engine.Engine.table(spark, sf, "embeddings")
      .select("embedding").as[Array[Float]].collect()
    val d = 64
    val dots = rows.map(v => v.map(_.toDouble).sum / 8.0)
    val w = Array.ofDim[Double](d)
    rows.zip(dots).foreach { case (v, dot) =>
      var j = 0
      while (j < d) { w(j) += v(j) * dot; j += 1 }
    }
    val nrm = math.sqrt(w.map(x => x * x).sum)
    val lambda0 = dots.map(x => x * x).sum
    got.foreach { case (dim, wRaw, wUnit, lam) =>
      val j = dim.toInt - 1
      assert(math.abs(wRaw - w(j)) < 1e-4, s"dim $dim raw")
      assert(math.abs(wUnit - w(j) / nrm) < 1e-6, s"dim $dim unit")
      assert(math.abs(lam - lambda0) < 1e-4, s"lambda0")
    }
    // the iterate is unit-norm
    assert(math.abs(got.map(r => r._3 * r._3).sum - 1.0) < 1e-4)
  }
}
