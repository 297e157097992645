package graft

/** Specs for round-5 batch R5t: peak definition re-check, Bradley-Terry
  * ordering coherence, reconciliation band completeness.
  */
class R5tSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("w32_peak_detection: every emitted peak beats neighbors and floor") {
    val peaks = Queries.byName("w32_peak_detection").fn(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(peaks.nonEmpty, "a year of daily data must contain peaks")
    val daily = graft.engine.Engine.table(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM-dd")
        .as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("rev"))
      .orderBy("day").as[(String, Long)].collect().toSeq
    val idx = daily.map(_._1).zipWithIndex.toMap
    peaks.foreach { case (day, rev, _, prom) =>
      val i = idx(day)
      assert(i > 0 && i < daily.size - 1)
      assert(daily(i)._2 == rev)
      assert(rev > daily(i - 1)._2 && rev > daily(i + 1)._2,
        s"$day must beat both neighbors")
      assert(prom > 1500000, s"$day prominence must clear the 1.5x floor")
    }
  }

  test("ml_bradley_terry_step: strengths order consistent with win rate") {
    val rows = Queries.byName("ml_bradley_terry_step").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size >= 10)
    rows.foreach { case (p, games, winsDeci, pi2) =>
      assert(games > 0)
      assert(winsDeci >= 0 && winsDeci <= games * 10)
      assert(pi2 > 0, s"part $p strength must be positive")
    }
    val pis = rows.map(_._4)
    assert(pis.zip(pis.drop(1)).forall { case (a, b) => a >= b },
      "output must be ordered by strength")
    // strengths are a probability-model scale: roughly centered near 1
    assert(pis.max < 10000000 && pis.min > 10000,
      s"strength scale implausible: ${pis.min}..${pis.max}")
  }

  test("dq_order_reconciliation: bands partition all orders") {
    val rows = Queries.byName("dq_order_reconciliation").fn(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val total = rows.map(_._2).sum
    val nOrders = graft.engine.Engine.table(spark, sf, "orders").count()
    val lineOnly = rows.filter(_._1 == "no_header").map(_._2).sum
    assert(total == nOrders + lineOnly,
      s"bands must partition header ∪ line orders: $total vs $nOrders")
    rows.foreach { case (band, n, tot, worst) =>
      assert(n > 0)
      assert(worst <= tot, s"$band: max delta cannot exceed the sum")
      if (band == "exact") assert(tot == 0 && worst == 0)
    }
  }
}
