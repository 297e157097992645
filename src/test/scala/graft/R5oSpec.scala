package graft

/** Specs for round-5 batch R5o: CUPED invariants, canonicalization
  * pick rules.
  */
class R5oSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("ml_cuped_uplift: variance reduction in [0,1], theta finite") {
    val Array((n, n1, theta, raw, adj, vr)) =
      Queries.byName("ml_cuped_uplift").fn(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 0 && n1 > 0 && n1 < n)
    assert(vr >= 0 && vr <= 1000000,
      s"variance reduction share must be a squared correlation: $vr")
    assert(math.abs(theta) < 100000000L, "theta must be finite/plausible")
    // CUPED adjusts the point estimate; both readouts must exist
    assert(raw != 0 || adj != 0 || n > 0)
  }

  test("curate_cluster_canonical: canonical is the longest-then-smallest") {
    val rows = Queries.byName("curate_cluster_canonical").fn(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val docs = graft.engine.Engine.table(spark, sf, "documents")
      .selectExpr("doc_id", "n_chars",
        "md5(concat_ws(' ', array_sort(array_distinct(split(text, ' '))))) AS fp")
      .as[(Long, Long, String)].collect().toSeq.groupBy(_._3)
    val expected = docs.filter(_._2.size >= 2)
    assert(rows.size == expected.size,
      s"must surface every >=2 group: got ${rows.size}, want ${expected.size}")
    rows.foreach { case (fp, nm, canon, canonChars, reclaim) =>
      val grp = docs(fp)
      assert(grp.size == nm)
      val best = grp.map(g => (-g._2, g._1)).min
      assert(canon == best._2, s"group $fp: wrong canonical")
      assert(canonChars == -best._1)
      assert(reclaim == grp.map(_._2).sum - canonChars)
      assert(reclaim >= 0)
    }
  }
}
