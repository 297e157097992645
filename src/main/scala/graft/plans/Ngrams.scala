package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram kernels (round 13): one compiled per-row loop replacing
  * the interpreted higher-order chains on the boilerplate/BLEU paths.
  *
  * `F.ngrams(toks, n)` is the composed form — (n−1) nested `zip_with`
  * lambdas, each allocating an intermediate Catalyst array and
  * dispatching a closure per element (higher-order functions never
  * reach whole-stage codegen); hashing then pays one more interpreted
  * `transform`. These two nodes emit the same values from a single
  * static-shaped call per row (the BigramShingleIds pattern):
  *
  *  - [[NgramStrings]] ≡ `F.ngrams(toks, n)`: space-joined n-grams in
  *    order (NOT distinct), `size < n` or a NULL array → EMPTY array
  *    (F.ngrams' total form), an n-gram touching a NULL token → null
  *    element (concat semantics).
  *  - [[NgramHashes]] ≡ `transform(F.ngrams(toks, n), g => xxhash64(g))`:
  *    the 64-bit XXH64 of each n-gram's UTF-8 bytes at Spark's seed 42;
  *    a null gram hashes to the bare seed (hash expressions fold null
  *    as a no-op) — exactly `xxhash64(null)`.
  */
private[plans] object NgramKernel {
  val Seed = 42L // spark.sql.functions.xxhash64's fixed seed
  private val space = UTF8String.fromString(" ")

  def grams(toks: ArrayData, n: Int): Array[UTF8String] = {
    val sz = toks.numElements()
    if (sz < n) return Array.empty
    val ts = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[UTF8String](sz - n + 1)
    i = 0
    while (i <= sz - n) {
      var anyNull = false
      var j = 0
      while (j < n && !anyNull) { anyNull = ts(i + j) == null; j += 1 }
      // concatWs SKIPS nulls (concat_ws semantics), so the null case is
      // routed around it to keep concat's null-propagation
      out(i) =
        if (anyNull) null
        else if (n == 1) ts(i)
        else UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(ts, i, i + n): _*)
      i += 1
    }
    out
  }
}

case class NgramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_strings expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_strings"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else computeRow(v.asInstanceOf[ArrayData])
  }

  def computeRow(toks: ArrayData): ArrayData =
    new GenericArrayData(
      NgramKernel.grams(toks, n).asInstanceOf[Array[Any]])
  def emptyResult(): ArrayData = new GenericArrayData(Array.empty[Any])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("ngs", this, classOf[NgramStrings].getName)
    ev.copy(
      code = code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? $ref.emptyResult() : $ref.computeRow(${c.value});
         |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramStrings =
    copy(child = newChild)
}

object NgramStrings {
  def apply(toks: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStrings(GraftSqlBridge.expression(toks), n))
}

case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_hashes"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Long])
    else computeRow(v.asInstanceOf[ArrayData])
  }

  def computeRow(toks: ArrayData): ArrayData = {
    val gs = NgramKernel.grams(toks, n)
    val out = new Array[Long](gs.length)
    var i = 0
    while (i < gs.length) {
      out(i) =
        if (gs(i) == null) NgramKernel.Seed
        else XXH64.hashUTF8String(gs(i), NgramKernel.Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
  def emptyResult(): ArrayData = new GenericArrayData(Array.empty[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("ngh", this, classOf[NgramHashes].getName)
    ev.copy(
      code = code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? $ref.emptyResult() : $ref.computeRow(${c.value});
         |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  def apply(toks: Column, n: Int): Column =
    GraftSqlBridge.column(NgramHashes(GraftSqlBridge.expression(toks), n))
}
