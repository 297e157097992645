package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.plans.HyperplaneSigChunks

/** Pins the native [[graft.plans.HyperplaneSigChunks]] codegen node to the
  * composed-fold reference ([[Similarity.hyperplaneSigFrom]]): same plane
  * weights, same sign decisions, chunk k ≡ fold over planes [k·P, k·P+P).
  * The equivalence is structural (quantized inputs ⇒ exact integer plane
  * dots ⇒ order-independent signs), but a weight-formula or bit-layout
  * drift between the two implementations — or between either and the
  * oracle SQL — would silently flip LSH buckets; this spec makes it loud.
  */
class SigChunksSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = (0L until 64L).map { i =>
    (i, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 0.9).toFloat))
  }.toDF("id", "emb")
    .select(col("id"),
      Similarity.quantize(Similarity.toDoubleVec(col("emb"))).as("v"))

  test("native sig chunks match the composed-fold signatures bit-for-bit") {
    val chunks = 8
    val p = 8
    val withBoth = vecs
      .withColumn("sa", HyperplaneSigChunks(col("v"), chunks, p, 64))
      .select(col("id"), col("sa"),
        array((0 until chunks).map(k =>
          Similarity.hyperplaneSigFrom(col("v"), from = k * p,
            nPlanes = p, dim = 64)): _*).as("folds"))
    val rows = withBoth.collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val sa = r.getSeq[Long](1)
      val folds = r.getSeq[Long](2)
      assert(sa == folds,
        s"id=${r.getLong(0)}: native $sa != fold $folds — plane weights " +
          "or bit layout drifted between HyperplaneSigChunks and " +
          "hyperplaneSigFrom (and therefore the oracle SQL)")
    }
  }

  test("interpreted eval matches codegen output") {
    // force the interpreted path through a direct expression eval
    val expr = HyperplaneSigChunks(
      org.apache.spark.sql.GraftSqlBridge.expression(col("v")), 8, 8, 64)
    val viaDf = vecs.withColumn("sa",
        HyperplaneSigChunks(col("v"), 8, 8, 64))
      .select("sa").collect().map(_.getSeq[Long](0))
    val viaEval = vecs.select("v").collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Double](0).toArray)
      expr.nullSafeEval(arr)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    viaDf.zip(viaEval).foreach { case (a, b) =>
      assert(a == b, "codegen and interpreted paths diverge")
    }
  }
}
