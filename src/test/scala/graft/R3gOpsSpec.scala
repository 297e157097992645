package graft

import org.apache.spark.sql.functions._

/** Semantic pins for round-3 batch 7: the grid join's coverage proof
  * (banding loses no pair) and the ER pipeline's twin-recovery contract.
  */
class R3gOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("geo_grid_join: equals the brute-force cross join (no lost pairs)") {
    val got = Queries.byName("geo_grid_join").fn(spark, sf)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    // brute force over the same synthesized points
    val cust = graft.engine.Engine.table(spark, sf, "customer")
      .select(col("c_custkey"),
        ((col("c_custkey") % 12000) / 100.0 - 60).as("clat"),
        (((col("c_custkey") * 7) % 6000) / 100.0 - 30).as("clon"))
    val supp = graft.engine.Engine.table(spark, sf, "supplier")
      .select(col("s_suppkey"),
        (((col("s_suppkey") * 13) % 12000) / 100.0 - 60).as("slat"),
        (((col("s_suppkey") * 29) % 6000) / 100.0 - 30).as("slon"))
    val brute = cust.crossJoin(supp)
      .filter((col("clat") - col("slat")) * (col("clat") - col("slat")) +
        (col("clon") - col("slon")) * (col("clon") - col("slon")) <= 4)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the fixture actually exercises the join
  }

  test("geo_grid_join: haversine metric bounded by the radius geometry") {
    val ds = Queries.byName("geo_grid_join").fn(spark, sf)
      .select("dist_km").as[Double].collect()
    // 2 degrees of arc is at most ~222.5 km on the great circle
    assert(ds.forall(d => d >= 0.0 && d <= 223.0))
  }

  test("er_name_cluster: every dirty twin joins its clean record") {
    val byId = Queries.byName("er_name_cluster").fn(spark, sf)
      .select("entity_id", "cluster_id").as[(Long, Long)].collect().toMap
    val dirty = byId.keys.filter(_ >= 1000000L)
    assert(dirty.nonEmpty)
    dirty.foreach { d =>
      assert(byId(d) === byId(d - 1000000L),
        s"twin $d not clustered with its clean record")
    }
    // labels are canonical: every cluster id is the min entity in it
    byId.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
  }
}
