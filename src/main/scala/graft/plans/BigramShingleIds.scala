package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: distinct md5-derived 32-bit ids of the
  * adjacent-bigram shingles of a token array, in first-occurrence order.
  *
  * Fuses the composed chain
  * `array_distinct(transform(Dedup.bigramShinglesFromToks(toks), g =>
  * Dedup.tokenId(g)))` — which is TWO interpreted higher-order lambdas
  * (shingle concat, md5+conv per element) plus two intermediate Catalyst
  * arrays per row — into one compiled loop (the round-12
  * HyperplaneSigChunks lesson: HOF lambdas never reach whole-stage
  * codegen). Semantics are exactly the composed form's:
  *
  *  - id = `conv(substring(md5(a || ' ' || b), 1, 8), 16, 10)` — the
  *    first 4 md5 bytes of the shingle's UTF-8 bytes read as an unsigned
  *    big-endian int (so ids mirror the DuckDB oracle's
  *    `('0x' || substr(md5(s),1,8))::BIGINT`);
  *  - `< 2` tokens, or a NULL token array, yield an EMPTY array
  *    (matching the `when(size(toks) >= 2, ...).otherwise(array())`
  *    guard, where `size(NULL)` is NULL and falls to otherwise) — the
  *    expression is total, never null;
  *  - a NULL token nulls its shingles (concat semantics); at most one
  *    null survives the distinct, in first-occurrence position.
  *    De-duplicating by id subsumes the chain's distinct-by-string-
  *    then-distinct-by-id (equal strings hash equal; colliding strings
  *    were merged by the outer distinct anyway, at the same first
  *    occurrence).
  */
case class BigramShingleIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_shingle_ids expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "bigram_shingle_ids"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) BigramShingleIds.Empty
    else BigramShingleIds.compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // one static-shaped call per ROW keeps the whole-stage span intact
    // (vs. per-element lambda dispatch in the composed HOF form); the
    // expression instance rides along as a codegen reference object
    val ref = ctx.addReferenceObj("bsi", this, classOf[BigramShingleIds].getName)
    ev.copy(
      code = code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? $ref.emptyResult() : $ref.computeRow(${c.value});
         |""".stripMargin,
      isNull = FalseLiteral)
  }

  // Java-callable bridges for the generated code
  def emptyResult(): ArrayData = BigramShingleIds.Empty
  def computeRow(toks: ArrayData): ArrayData = BigramShingleIds.compute(toks)

  override protected def withNewChildInternal(newChild: Expression): BigramShingleIds =
    copy(child = newChild)
}

object BigramShingleIds {
  /** Column-API entry point: `BigramShingleIds(toksCol)`. */
  def apply(toks: Column): Column =
    GraftSqlBridge.column(BigramShingleIds(GraftSqlBridge.expression(toks)))

  def Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val space = Array(' '.toByte)

  /** One row's shingle-id set; called once per row from both eval and the
    * generated code (a single static call stays inside the whole-stage
    * span, unlike a per-element lambda).
    */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return Empty
    val digest = md5.get()
    val seen = new java.util.HashSet[Long](math.max(16, (n - 1) * 2))
    var seenNull = false
    val out = new scala.collection.mutable.ArrayBuffer[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1)) {
        if (!seenNull) { seenNull = true; out += null }
      } else {
        digest.reset()
        digest.update(toks.getUTF8String(i).getBytes)
        digest.update(space)
        digest.update(toks.getUTF8String(i + 1).getBytes)
        val d = digest.digest()
        val id = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        if (seen.add(id)) out += java.lang.Long.valueOf(id)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
