package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}

import graft.operators.Similarity

/** Integer-exact retrieval invariants (the rounds-4/5 `rag_context_pack`
  * driver-red root fix): the brute-force cosine path must quantize
  * components to `round(x·2^20)`, keep dot/norms as exact BIGINTs, and
  * rank by an exact integer key — NO double-typed expression may appear
  * in the top-k window's ordering, so an engine- or version-dependent
  * float ulp can never flip a rank or a rounded output cell again.
  */
class ExactRetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = {
    val rows = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 8 + j) * 0.5).toFloat))
    }
    rows.toDF("id", "emb")
      .select(col("id"), Similarity.toDoubleVec(col("emb")).as("vec"))
  }

  test("bruteForceTopK rank ordering carries no double-typed sort key") {
    val q = corpus.limit(3).select(col("id").as("q_id"), col("vec").as("qv"))
    val top = Similarity.bruteForceTopK(corpus, q, 5)
    // assert on the optimized LOGICAL plan (the physical one hides under
    // AdaptiveSparkPlan pre-execution); cover the TopKPerKey rewrite too
    val orderTypes = top.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.orderSpec.map(_.child.dataType)
      case t: graft.plans.TopKPerKeyNode => t.order.map(_.child.dataType)
    }.flatten
    assert(orderTypes.nonEmpty, "top-k must rank through a window/top-k node")
    assert(!orderTypes.exists(t => t == DoubleType || t == FloatType),
      s"rank ordering must be integer-exact, got $orderTypes")
  }

  test("quantized dot/norm columns are exact BIGINTs; rank key is integral") {
    val q = corpus.limit(2).select(col("id").as("q_id"), col("vec").as("qv"))
    val top = Similarity.bruteForceTopK(corpus, q, 3)
    val sch = top.schema
    assert(sch("dot_l").dataType == LongType)
    assert(sch("nq").dataType == LongType)
    assert(sch("ni").dataType == LongType)
    assert(sch("rk_key").dataType == LongType,
      "IntegralDivide of the decimal cross-product must emit LONG")
    // cos must be derived from the SAME integers: cos == dot/sqrt(nq*ni)
    val rows = top.select("dot_l", "nq", "ni", "cos").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getLong(0).toDouble /
        math.sqrt(r.getLong(1).toDouble * r.getLong(2).toDouble)
      assert(java.lang.Double.doubleToLongBits(expected) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        "cos must be bit-equal to the one-division-of-integers form")
    }
  }

  test("quantize is a pure power-of-two rescale of float inputs") {
    // float·2^20 is exact, so round() returns the same integer everywhere
    val vals = corpus.select(explode(Similarity.quantize(col("vec"))).as("q"))
      .collect().map(_.getDouble(0))
    assert(vals.forall(v => v == math.rint(v)), "components must be integral")
    assert(vals.forall(v => math.abs(v) <= (1L << 20)), "|x| ≤ 1 → |q| ≤ 2^20")
  }

  test("cosRankKey is monotone with cosine and truncates toward zero") {
    // hand-built: dots of both signs, norms that force the trunc path
    val df = Seq((5L, 4L, 9L), (-5L, 4L, 9L), (7L, 9L, 16L), (0L, 3L, 3L))
      .toDF("dot_l", "nq", "ni")
      .withColumn("k", Similarity.cosRankKey(col("dot_l"), col("nq"), col("ni")))
    val got = df.select("k").collect().map(_.getLong(0))
    // k = trunc(dot·|dot|·1e10 / (nq·ni))
    assert(got(0) == 25L * 10000000000L / 36L)
    assert(got(1) == -(25L * 10000000000L / 36L), "negative dots mirror")
    assert(got(2) == 49L * 10000000000L / 144L)
    assert(got(3) == 0L)
  }
}
