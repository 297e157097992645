package graft

import org.apache.spark.sql.functions._
import graft.operators.TopKAggregator

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator: bounded state, deterministic order, merge-correct") {
    val rows = (1L to 1000L).map(i => (s"g${i % 3}", (i, (i % 97).toDouble)))
    val ds = rows.toDF("g", "x").as[(String, (Long, Double))]
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TopKAggregator.topK(5).toColumn.name("top5"))
      .collect().toMap
    assert(out.keySet == Set("g0", "g1", "g2"))
    out.values.foreach { top =>
      assert(top.length == 5)
      // descending by score, ties broken by smaller id first
      assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
      assert(top.head._2 == 96.0)
    }
    // cross-check one group against a plain sort
    val expected = rows.filter(_._1 == "g0").map(_._2)
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(out("g0").toSeq == expected)
  }

  test("top-k reduce: fast-reject path dominates, stays allocation-light") {
    // driver-side micro-bench of the reduce loop shape the executors run:
    // 1M rows into k=10 — after warm-up almost every row takes the O(1)
    // reject branch. Informational timing printed; asserts correctness.
    val agg = TopKAggregator.topK(10)
    val rnd = new scala.util.Random(42)
    val rows = Array.fill(1000000)((rnd.nextLong(), rnd.nextDouble()))
    val t0 = System.nanoTime()
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"1M-row reduce into k=10: $ms%.0f ms (${1e3 * rows.length / ms}%.0f rows/s)")
    val top = agg.finish(buf)
    assert(top.length == 10)
    assert(top.map(_._2).toSeq == rows.map(_._2).sorted.reverse.take(10).toSeq)
  }

  test("sketch aggregations: HLL distinct and approx percentile plan + sane values") {
    val df = Engine2.ordersLike(spark)
    val r = df.groupBy((col("custkey") % 2).as("g"))
      .agg(approx_count_distinct("orderkey").as("approx_n"),
        expr("approx_percentile(amount, 0.5)").as("approx_med"),
        countDistinct("orderkey").as("exact_n"))
      .collect()
    r.foreach { row =>
      val (approx, exact) = (row.getAs[Long]("approx_n"), row.getAs[Long]("exact_n"))
      assert(math.abs(approx - exact) <= exact * 0.1, s"HLL error too big: $approx vs $exact")
      assert(row.getAs[Double]("approx_med") > 0)
    }
  }
}
