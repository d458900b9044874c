package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, UTF8StringUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused split + element parse for the typed-array kernel operators: one
 * native eval replaces JavaSplitExpr + a per-element Cast lambda (the
 * transform() form interprets the whole parse chain once per element).
 *
 * Parse semantics are Spark's OWN ANSI cast, not a reimplementation:
 * doubles go through `String.toDouble` with
 * `Cast.processFloatingPointSpecialLiterals` as the fallback and longs
 * through `UTF8StringUtils.toLongExact` — the exact code paths
 * `CAST(x AS DOUBLE/BIGINT)` runs — and malformed input throws the same
 * SparkNumberFormatException via
 * `QueryExecutionErrors.invalidInputInCastToNumberError`. On top of the
 * cast sit the reference's whitelist rules (MsgTransformations.scala:
 * 259-265, 369-374, 388-393): nan-listed doubles become Double.NaN,
 * longs trim exactly one trailing ".0" and nan-listed values become NULL
 * (longs have no NaN — the documented divergence).
 *
 * ALWAYS-ANSI contract: malformed input throws regardless of
 * `spark.sql.ansi.enabled`. This is deliberate — the reference kernel
 * fails loudly on unparseable values (a silent NULL in a 100 TB typed
 * conversion is data corruption discovered weeks later), so these
 * expressions keep the strict behavior even in a non-ANSI session
 * rather than inheriting the session's cast laxity. Callers wanting
 * NULL-on-malformed should pre-filter with rlike, not flip a conf.
 */
abstract class ParseArrayExpr extends UnaryExpression {

  def delimiter: String
  def nanValues: Seq[String]
  def elemType: DataType

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

  // containsNull mirrors the transform()-lambda form's schema (long
  // parses really can yield NULL elements via the nan whitelist)
  override def dataType: DataType = ArrayType(elemType, containsNull = true)

  @transient protected lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(delimiter)
  @transient protected lazy val nanSet: Set[String] = nanValues.toSet

  protected def parse(part: String): Any

  override protected def nullSafeEval(input: Any): Any = {
    val parts = pattern.split(input.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = parse(parts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parseArrExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.ParseArrayExpr) $ref).nullSafeEval($c)")
  }
}

/** array<double> parse: split → nan-whitelist → ANSI double cast. */
case class ParseDoubleArrayExpr(
  child: Expression, delimiter: String, nanValues: Seq[String]
) extends ParseArrayExpr {

  override def elemType: DataType = DoubleType
  override def prettyName: String = "parse_double_array"

  override protected def parse(part: String): Any =
    if (nanSet.contains(part)) Double.NaN
    else
      try part.toDouble
      catch {
        case _: NumberFormatException =>
          val d = Cast.processFloatingPointSpecialLiterals(part, false)
          if (d == null)
            throw GraftSqlBridge.invalidCastToNumberError(
              DoubleType, UTF8String.fromString(part))
          d.asInstanceOf[java.lang.Double].doubleValue()
      }

  override protected def withNewChildInternal(newChild: Expression): ParseDoubleArrayExpr =
    copy(child = newChild)
}

/** array<long> parse: split → trim one ".0" → nan-whitelist (→ NULL) →
  * ANSI long cast. */
case class ParseLongArrayExpr(
  child: Expression, delimiter: String, nanValues: Seq[String]
) extends ParseArrayExpr {

  override def elemType: DataType = LongType
  override def prettyName: String = "parse_long_array"

  override protected def parse(part: String): Any = {
    val trimmed =
      if (part.endsWith(".0")) part.substring(0, part.length - 2) else part
    if (nanSet.contains(trimmed)) null
    else UTF8StringUtils.toLongExact(UTF8String.fromString(trimmed), null)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLongArrayExpr =
    copy(child = newChild)
}

object ParseDoubleArrayExpr {
  def apply(c: Column, delimiter: String, nanValues: Set[String]): Column =
    GraftSqlBridge.column(ParseDoubleArrayExpr(
      GraftSqlBridge.expression(c), delimiter, nanValues.toSeq.sorted))
}

object ParseLongArrayExpr {
  def apply(c: Column, delimiter: String, nanValues: Set[String]): Column =
    GraftSqlBridge.column(ParseLongArrayExpr(
      GraftSqlBridge.expression(c), delimiter, nanValues.toSeq.sorted))
}
