package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType, NumericType}

/**
 * Bucket index against a SORTED boundary array by binary search: the
 * number of boundaries strictly below the value — value <= b(0) → 0,
 * value > b(last) → boundaries.length. The level primitive behind
 * rank-scaled z-ordering ([[graft.operators.Layout
 * .withZorderValueRanked]]): boundary arrays there are 2^bits − 1
 * quantiles, and an `aggregate`-HOF spelling would pay O(2^bits)
 * interpreted lambda frames per row per column where this pays
 * O(bits) primitive compares. Duplicate boundaries (a quantile hit
 * repeatedly on skewed data) collapse levels consistently: the search
 * returns the count of boundaries < v whatever the duplication.
 *
 * Boundaries are expression state (the [[MatVecExpr]] convention),
 * shipped once per task with the serialized plan — a 16-bit, 4-column
 * layout ships ~2 MB, the price of rank scaling without a global sort.
 * NULL input → NULL (the operator layer maps it to level 0 with its
 * documented missing-key convention).
 */
case class SortedBucketExpr(child: Expression, boundaries: Seq[Double])
  extends UnaryExpression {

  require(boundaries.nonEmpty, "boundaries must be non-empty")
  require(boundaries.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
    "boundaries must be sorted ascending")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${dt.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_bucket"

  @transient private[functions] lazy val b: Array[Double] = boundaries.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = child.dataType match {
      case DoubleType => input.asInstanceOf[Double]
      // Spark's Decimal is not a java.lang.Number — cast explicitly
      case _: DecimalType => input.asInstanceOf[Decimal].toDouble
      case _ => input.asInstanceOf[Number].doubleValue()
    }
    SortedBucketExpr.search(b, v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedBucketExpr", this)
    // a C-style (double) cast does not compile for the Decimal object
    // type — use its own conversion
    val toDouble: String => String = child.dataType match {
      case _: DecimalType => c => s"($c).toDouble()"
      case _ => c => s"(double)($c)"
    }
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortedBucketExpr.search($ref.b(), ${toDouble(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedBucketExpr =
    copy(child = newChild)
}

object SortedBucketExpr {

  /** Count of boundaries strictly below `v` (binary search, O(log n)). */
  def search(b: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  def apply(c: Column, boundaries: Seq[Double]): Column =
    GraftSqlBridge.column(SortedBucketExpr(GraftSqlBridge.expression(c), boundaries))
}
