package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: `nChunks` hyperplane sign-signatures of an
  * `array<double>` vector in ONE fused pass — chunk `k` packs the sign
  * bits of planes `[k·P, k·P+P)` (bit `p−k·P` set iff `dot(vec,
  * plane_p) > 0`), using the same deterministic plane weights as
  * [[graft.operators.Similarity.hyperplaneSigFrom]]:
  * `w(p,i) = ((p·131 + i·31 + 7) mod 13) − 6`.
  *
  * WHY a custom Expression (round 12, the sim_knn_label de-quadratify):
  * the banded-LSH kNN path needs 8 signatures per row (4 band + 4
  * refinement), and the composed `aggregate`/`transform` fold is a
  * higher-order function — NOT whole-stage-codegen'd, so every plane dot
  * evaluates through interpreted lambda dispatch with boxing. Measured:
  * the 3-lineage banded sig computation dominated sim_knn_label at
  * ~5.5 s for 2 000 rows. This node emits one tight nested loop into
  * whole-stage codegen; the interpreted fallback (`nullSafeEval`)
  * mirrors it exactly.
  *
  * Bit-equivalence with the fold form is structural, not luck: the
  * quantized inputs are exact integers and the weights are small
  * integers, so every plane dot is an exact integer in double arithmetic
  * regardless of summation order — the sign decision is identical on
  * every engine and every evaluation strategy (`SigChunksSpec` pins it
  * against hyperplaneSigFrom).
  */
case class HyperplaneSigChunks(child: Expression, nChunks: Int,
                               planesPerChunk: Int, dim: Int)
    extends UnaryExpression {

  require(nChunks > 0 && planesPerChunk > 0 && planesPerChunk <= 63,
    s"need 0 < planesPerChunk <= 63, got $planesPerChunk")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig_chunks expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig_chunks"

  /** Plane-major weight matrix, shared by eval and codegen (shipped to
    * generated code via `addReferenceObj`).
    */
  @transient lazy val weights: Array[Array[Double]] =
    Array.tabulate(nChunks * planesPerChunk, dim)((p, i) =>
      ((p * 131 + i * 31 + 7) % 13 - 6).toDouble)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nChunks)
    var p = 0
    while (p < nChunks * planesPerChunk) {
      val w = weights(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += v.getDouble(i) * w(i)
        i += 1
      }
      if (s > 0) out(p / planesPerChunk) |= 1L << (p % planesPerChunk)
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val wRef = ctx.addReferenceObj("planes", weights, "double[][]")
      val (n, out, p, s, i, w) = (ctx.freshName("n"), ctx.freshName("out"),
        ctx.freshName("p"), ctx.freshName("s"), ctx.freshName("i"),
        ctx.freshName("w"))
      val total = nChunks * planesPerChunk
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$nChunks];
         |for (int $p = 0; $p < $total; $p++) {
         |  double[] $w = $wRef[$p];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) { $s += $v.getDouble($i) * $w[$i]; }
         |  }
         |  if ($s > 0) { $out[$p / $planesPerChunk] |= 1L << ($p % $planesPerChunk); }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigChunks =
    copy(child = newChild)
}

object HyperplaneSigChunks {
  /** Column-API entry point. */
  def apply(vec: Column, nChunks: Int, planesPerChunk: Int, dim: Int): Column =
    GraftSqlBridge.column(HyperplaneSigChunks(
      GraftSqlBridge.expression(vec), nChunks, planesPerChunk, dim))
}
