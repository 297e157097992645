package graft

import org.apache.spark.sql.functions._
import graft.engine.Engine
import graft.plans.TopKPerKey

/** The custom per-key top-k physical operator: agreement with the
  * window row_number form, two-phase plan shape (partial before the
  * exchange), and deterministic tie handling.
  */
class TopKPerKeyPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def orders = Engine.table(spark, sf, "orders")
    .select("o_orderpriority", "o_orderkey", "o_totalprice")

  test("matches the window row_number answer exactly") {
    val custom = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
      .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))
      .collect()
    val viaWindow = orders.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))
      .collect()
    assert(custom.toSeq == viaWindow.toSeq)
  }

  test("plans as partial + final heaps around one key exchange — no sort of the input") {
    val df = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect() // finalize AQE so the plan string shows the real operators
    val plan = df.queryExecution.executedPlan.toString
    // the node renders without the Exec suffix; partial sits inside the
    // shuffle stage, final above it. Count only the final plan — AQE's
    // tree string repeats every node under "== Initial Plan ==".
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("TopKPerKey \\[".r.findAllIn(finalPlan).size == 2,
      s"expected partial+final TopKPerKey nodes, plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      "final phase must cluster by the key")
    assert(!plan.contains("Sort "), "the operator must not sort the input stream")
  }

  test("k larger than any group degrades to identity (all rows kept)") {
    val n = orders.count()
    val kept = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), Int.MaxValue).count()
    assert(kept == n)
  }
}
