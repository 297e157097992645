package graft

import org.apache.spark.sql.functions._

/** Specs for round-3 batch 39 (R4m): NMI information-theoretic bounds
  * and a driver-side contingency replay, survivorship rule replay per
  * field, and DBSCAN classification invariants (core monotonicity,
  * border adjacency, noise isolation).
  */
class R4mSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("cluster nmi: bounds and driver-side contingency replay") {
    val got = Queries.byName("ml_cluster_nmi").fn(spark, sf)
      .select("n", "k_clusters", "k_labels", "purity", "mi",
        "h_cluster", "h_label", "nmi")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.size == 1)
    val (n, kc, kl, purity, mi, hc, hl, nmi) = got.head
    val pts = graft.engine.Engine.table(spark, sf, "embeddings")
      .select(col("label").cast("long"),
        ((element_at(col("embedding"), 1) > 0f).cast("long") * 4 +
          (element_at(col("embedding"), 2) > 0f).cast("long") * 2 +
          (element_at(col("embedding"), 3) > 0f).cast("long")))
      .as[(Long, Long)].collect().toSeq
    assert(pts.size.toLong == n)
    val cont = pts.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val mc = pts.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val mlg = pts.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    assert(mc.size.toLong == kc && mlg.size.toLong == kl)
    val nD = n.toDouble
    val expMi = cont.map { case ((lbl, cl), c) =>
      (c / nD) * math.log(nD * c / (mc(cl) * mlg(lbl)))
    }.sum
    val expHc = mc.values.map(a => -(a / nD) * math.log(a / nD)).sum
    val expHl = mlg.values.map(b => -(b / nD) * math.log(b / nD)).sum
    val expPurity = mc.keys.toSeq.map(cl =>
      cont.collect { case ((l, c), v) if c == cl => v }.max).sum / nD
    assert(math.abs(mi - expMi) < 1e-5)
    assert(math.abs(hc - expHc) < 1e-5)
    assert(math.abs(hl - expHl) < 1e-5)
    assert(math.abs(purity - expPurity) < 1e-5)
    assert(math.abs(nmi - expMi / math.sqrt(expHc * expHl)) < 1e-4)
    // information-theoretic bounds
    assert(mi >= -1e-9 && mi <= math.min(hc, hl) + 1e-9)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
    assert(purity >= 1.0 / kl - 1e-9 && purity <= 1.0 + 1e-9)
  }

  test("survivorship: each field follows its own rule") {
    val got = Queries.byName("er_survivorship").fn(spark, sf)
      .select("custkey", "n_orders", "first_day", "last_day",
        "latest_status", "top_priority", "max_price")
      .as[(Long, Long, String, String, String, String, Double)]
      .collect().toSeq
    assert(got.nonEmpty)
    val orders = graft.engine.Engine.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string"),
        col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .as[(Long, Long, String, String, String, Double)]
      .collect().toSeq.groupBy(_._1)
    got.foreach { case (ck, n, fd, ld, st, prio, mp) =>
      val os = orders(ck)
      assert(os.size.toLong == n)
      assert(fd == os.map(_._3).min && ld == os.map(_._3).max)
      assert(mp == os.map(_._6).max)
      val latest = os.maxBy(o => (o._3, o._2))
      assert(st == latest._4, s"cust $ck latest status")
      val expPrio = os.groupBy(_._5).view.mapValues(_.size).toSeq
        .sortBy { case (p, c) => (-c, p) }.head._1
      assert(prio == expPrio, s"cust $ck mode priority")
    }
  }

  test("dbscan: core/border/noise invariants hold") {
    val got = Queries.byName("geo_dbscan_core").fn(spark, sf)
      .select("custkey", "n_neighbors", "role")
      .as[(Long, Long, String)].collect().toSeq
    assert(got.nonEmpty)
    def coords(k: Long): (Double, Double) =
      ((k % 12000) / 100.0 - 60, ((k * 7) % 6000) / 100.0 - 30)
    val pts = got.map(r => (r._1, coords(r._1)))
    def neighbors(k: Long): Seq[Long] = {
      val (la, lo) = coords(k)
      pts.filter { case (k2, (la2, lo2)) =>
        k2 != k &&
          (la - la2) * (la - la2) + (lo - lo2) * (lo - lo2) <= 4
      }.map(_._1)
    }
    val roles = got.map(r => r._1 -> r._3).toMap
    got.foreach { case (k, nN, role) =>
      val nbrs = neighbors(k)
      assert(nbrs.size.toLong == nN, s"cust $k neighbor count")
      role match {
        case "core" => assert(nN >= 50, s"cust $k core with $nN")
        case "border" =>
          assert(nN < 50, s"cust $k border but core-sized")
          assert(nbrs.exists(roles(_) == "core"),
            s"cust $k border without core neighbor")
        case "noise" =>
          assert(nN < 50)
          assert(!nbrs.exists(roles(_) == "core"),
            s"cust $k noise adjacent to a core")
        case other => fail(s"unknown role $other")
      }
    }
  }
}
