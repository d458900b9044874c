package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native SQUARED L2 distance between two numeric arrays: one fused pass
 * accumulating Σ(x−y)² in element order — the [[CosineSimExpr]] shape
 * with the product-quantization metric. PQ k-means and asymmetric-
 * distance scoring minimize Euclidean distance per SUBSPACE (cosine is
 * meaningless there: subvectors are not normalized), and the square
 * root is monotone so argmin needs only the squared form.
 *
 * NULL when either side is NULL, lengths differ, or an element is NULL
 * (NULL sorts last / fails filters — same rationale as CosineSimExpr's
 * zero-norm rule).
 */
case class L2DistSqExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires numeric arrays, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_dist_sq"

  @transient private lazy val leftType = elemType(left).get
  @transient private lazy val rightType = elemType(right).get

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = get(a, i, leftType) - get(b, i, rightType)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2Expr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // freshName: two l2_dist_sq calls in one projection must not
      // declare duplicate locals (would fail codegen → interpreted fallback)
      val d2 = ctx.freshName("l2")
      s"""
         |Object $d2 = ((graft.functions.L2DistSqExpr) $ref).nullSafeEval($l, $r);
         |if ($d2 == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((Double) $d2).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): L2DistSqExpr =
    copy(left = newLeft, right = newRight)
}

object L2DistSqExpr {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      L2DistSqExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
