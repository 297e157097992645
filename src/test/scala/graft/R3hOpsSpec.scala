package graft

import org.apache.spark.sql.functions._

/** Semantic pins for round-3 batch 8: attribution credit conservation
  * and the k-anonymity report's partition property.
  */
class R3hOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("w16_attribution: first and last models conserve total credit") {
    val rows = Queries.byName("w16_attribution").fn(spark, sf)
      .select("channel", "touches", "first_cents", "last_cents",
        "linear_cents")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val (f, l, lin) = (rows.map(_._3).sum, rows.map(_._4).sum,
      rows.map(_._5).sum)
    // first-touch and last-touch both allocate each attributed
    // conversion's full value exactly once
    assert(f === l && f > 0L)
    // linear floors cents div n per touch: never exceeds, loses at most
    // (n-1) cents per conversion
    assert(lin <= f && lin > 0L)
    assert(rows.forall(_._2 > 0L))
  }

  test("dq_k_anonymity: the two levels partition every customer") {
    val rows = Queries.byName("dq_k_anonymity").fn(spark, sf)
      .select("n", "level", "anonymous").as[(Long, Long, Boolean)]
      .collect()
    val total = graft.engine.Engine.table(spark, sf, "customer").count()
    assert(rows.map(_._1).sum === total)
    // level 0 rows passed the k threshold by construction
    assert(rows.filter(_._2 === 0L).forall(r => r._1 >= 5L && r._3))
    assert(rows.forall(r => r._3 === (r._1 >= 5L)))
    assert(rows.exists(_._2 === 1L)) // the fixture exercises the ladder
  }
}
