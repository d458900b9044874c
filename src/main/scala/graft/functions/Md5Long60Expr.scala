package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 60-bit MD5 hash: the first 15 hex chars of md5(input), as a Long.
 *
 * Semantically identical to `conv(substring(md5(c), 1, 15), 16, 10)` cast
 * to long — and bit-for-bit reproducible by other engines as
 * `('0x' || substr(md5(x),1,15))::BIGINT` — but evaluated as ONE digest
 * call: no 32-char hex string materialization, no base-16 re-parse, no
 * four-node interpreted expression chain. This matters because the
 * near-dup operators evaluate the hash inside higher-order-function
 * lambdas, where Spark interprets every expression node per array element
 * (no whole-stage codegen inside HOFs). Outside HOFs it code-gens to a
 * single static call.
 */
case class Md5Long60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Long60Expr$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)
}

/**
 * md5_long60 mapped over a whole array<string> in ONE eval call:
 * value-identical to `transform(arr, x => md5_long60(x))` (NULL elements
 * stay NULL, NULL array stays NULL), but without one interpreted lambda
 * frame per element — the per-shingle / per-word hashing step of every
 * dedup operator, where the array is the document's shingle or word list.
 */
case class Md5Long60ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "md5_long60_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = Md5Long60Expr.hash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5ArrExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.Md5Long60ArrayExpr) $ref).nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long60ArrayExpr =
    copy(child = newChild)
}

object Md5Long60ArrayExpr {
  def apply(c: Column): Column =
    GraftSqlBridge.column(Md5Long60ArrayExpr(GraftSqlBridge.expression(c)))
}

object Md5Long60Expr {

  private val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** A reset thread-local MD5 instance, for callers feeding the digest
    * incrementally (see ShingleHashExpr). */
  private[functions] def freshDigest(): MessageDigest = {
    val md = localDigest.get()
    md.reset()
    md
  }

  /**
   * First 60 bits of an MD5 digest: bytes 0-6 in full plus the high
   * nibble of byte 7 — exactly the value of the first 15 hex characters.
   */
  private[functions] def long60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def hash(s: UTF8String): Long =
    long60(freshDigest().digest(s.getBytes))

  /** Column form, for use from the DataFrame API. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(Md5Long60Expr(GraftSqlBridge.expression(c)))
}
