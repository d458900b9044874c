package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Split with EXACT Java `String.split(regex)` semantics — the contract
 * the reference's per-record code relies on
 * (MsgTransformations.scala:294): trailing empty strings dropped, a
 * delimiter-only input yields an empty array, but splitting "" yields
 * [""]. Implemented as one `Pattern.split` call (the literal reference
 * behavior, pattern compiled once per operator), replacing the
 * three-pass portable composite regexp_replace(trailing) → when(empty) →
 * split that emulated those semantics with Spark's split — and unlike
 * that composite it stays a single pass when evaluated per element
 * inside downstream array-parse lambdas. KernelPropertySpec pins the
 * caller against real String.split on random delimiter soups.
 */
case class JavaSplitExpr(child: Expression, delimiter: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else
      // malformed delimiter regexes fail at ANALYSIS time, not on executors
      try { java.util.regex.Pattern.compile(delimiter); TypeCheckResult.TypeCheckSuccess }
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName delimiter is not a valid regex: ${e.getMessage}")
      }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "java_split"

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(delimiter)

  override protected def nullSafeEval(input: Any): Any = {
    // Pattern.split(s) == s.split(regex): limit 0 drops trailing empties,
    // "" yields [""]
    val parts = pattern.split(input.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("javaSplitExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.JavaSplitExpr) $ref).nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): JavaSplitExpr =
    copy(child = newChild)
}

object JavaSplitExpr {
  def apply(c: Column, delimiter: String): Column =
    GraftSqlBridge.column(JavaSplitExpr(GraftSqlBridge.expression(c), delimiter))
}
