package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native lowercase-alnum tokenization (round 13 optimization): the two
  * regex normalization chains the corpus tier uses, each as ONE
  * compiled byte scan.
  *
  *  - [[AlnumTokens]] ≡
  *    `filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  *    "\\s+"), x => x =!= "")`
  *    After the replace, the string contains only [a-z0-9] and spaces,
  *    so the tokens are exactly the maximal runs of [a-z0-9] in the
  *    lowercased text. The kernel lowercases through the SAME
  *    UTF8String.toLowerCase Spark's Lower uses, then scans BYTES:
  *    ASCII alnum bytes never appear inside a multi-byte UTF-8
  *    sequence, so every non-alnum byte is a separator — byte-exact
  *    equivalence with the per-character regex replace.
  *  - [[AlnumNormalize]] ≡
  *    `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]",
  *    ""), " +", " "))`
  *    (DELETE the non-keep chars — '.' deletion joins neighbors —
  *    then collapse space runs, then trim.) One scan with a
  *    pending-space flag reproduces delete→collapse→trim exactly.
  *
  * Both are null-passthrough (each regex/split step propagates null)
  * and replace 3-4 interpreted/regex expression nodes per row with one
  * codegen'd call — the regex battery was ~0.16 s per corpus pass at
  * sf0.1 (TokProbe), paid by five graded queries.
  */
private[plans] object AlnumKernel {
  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def tokens(text: UTF8String): GenericArrayData = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes // materialized copy, offset 0
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isAlnum(bytes(i))) {
        val start = i
        while (i < n && isAlnum(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def normalize(text: UTF8String): UTF8String = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes
    val out = new Array[Byte](bytes.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (isAlnum(b)) {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = b; o += 1
      } else if (b == ' ' && o > 0) pendingSpace = true
      // any other byte is deleted (multi-byte chars delete per byte)
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

case class AlnumTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"alnum_tokens expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "alnum_tokens"

  override def nullSafeEval(v: Any): Any =
    AlnumKernel.tokens(v.asInstanceOf[UTF8String])
  def computeRow(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    AlnumKernel.tokens(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.AlnumKernel.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AlnumTokens =
    copy(child = newChild)
}

object AlnumTokens {
  def apply(text: Column): Column =
    GraftSqlBridge.column(AlnumTokens(GraftSqlBridge.expression(text)))
}

case class AlnumNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"alnum_normalize expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "alnum_normalize"

  override def nullSafeEval(v: Any): Any =
    AlnumKernel.normalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.AlnumKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): AlnumNormalize =
    copy(child = newChild)
}

object AlnumNormalize {
  def apply(text: Column): Column =
    GraftSqlBridge.column(AlnumNormalize(GraftSqlBridge.expression(text)))
}
