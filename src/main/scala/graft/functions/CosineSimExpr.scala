package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native cosine similarity between two numeric arrays: one fused pass
 * computing dot product and both norms with double accumulation in
 * element order — bit-identical to the zip_with + aggregate Column chain
 * it replaces (HashingSpec pins this), but one eval call instead of
 * 3 × dim interpreted lambda frames per pair. This is the innermost loop
 * of every ANN/near-dup operator: corpus × queries × dim evaluations.
 *
 * NULL result when either side is NULL, lengths differ, either side has a
 * NULL element, or either norm is zero. The zero-norm case is
 * deliberately NULL rather than the 0/0 NaN the naive division yields:
 * Spark orders NaN ABOVE every double, so a NaN score would rank a
 * zero vector as the best neighbor of every query and pass every
 * `>= threshold` filter; NULL sorts last and fails filters.
 */
case class CosineSimExpr(left: Expression, right: Expression)
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
  // NULL is possible even for non-null children (zero-norm vectors,
  // length mismatch) — without this override codegen would assume
  // non-null output for non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

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
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, i, leftType)
      val y = get(b, i, rightType)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineExpr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // freshName: two cosine_sim calls in one projection must not
      // declare duplicate locals (would fail codegen → interpreted fallback)
      val cs = ctx.freshName("cos")
      s"""
         |Object $cs = ((graft.functions.CosineSimExpr) $ref).nullSafeEval($l, $r);
         |if ($cs == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((Double) $cs).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
