package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/**
 * Dense matrix × vector as ONE native expression: the whole projected
 * vector computes in a tight primitive loop per row — no per-element
 * lambda frames (a HOF spelling pays outDim × inDim interpreted calls
 * per row) and no join. The row-major matrix is expression state (a
 * few KB for projection-sized matrices), shipping once per task with
 * the serialized plan.
 *
 * Built for [[graft.operators.Embeddings.randomProject]]'s JL
 * projection but shape-generic. NULL input → NULL; a length mismatch
 * yields NULL (the [[L2DistSqExpr]] convention — loud checks belong at
 * the operator layer). NULL ELEMENTS count as 0.
 */
case class MatVecExpr(child: Expression, matrix: Seq[Double], outDim: Int)
  extends UnaryExpression {

  require(outDim > 0, s"outDim must be positive: $outDim")
  require(matrix.nonEmpty && matrix.size % outDim == 0,
    s"matrix size ${matrix.size} is not a multiple of outDim $outDim")

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<numeric>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec"

  @transient private lazy val m: Array[Double] = matrix.toArray
  @transient private lazy val inDim: Int = matrix.size / outDim
  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != inDim) return null
    val v = new Array[Double](inDim)
    var i = 0
    elemType match {
      case FloatType =>
        while (i < inDim) { if (!arr.isNullAt(i)) v(i) = arr.getFloat(i); i += 1 }
      case DoubleType =>
        while (i < inDim) { if (!arr.isNullAt(i)) v(i) = arr.getDouble(i); i += 1 }
      case IntegerType =>
        while (i < inDim) { if (!arr.isNullAt(i)) v(i) = arr.getInt(i).toDouble; i += 1 }
      case LongType =>
        while (i < inDim) { if (!arr.isNullAt(i)) v(i) = arr.getLong(i).toDouble; i += 1 }
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      val off = j * inDim
      i = 0
      while (i < inDim) { s += m(off + i) * v(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecExpr", this)
    // nullSafeEval returns null on a length mismatch — the codegen must
    // propagate that to isNull (the L2DistSqExpr convention), not hand
    // downstream a null ArrayData value
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object mv = ((graft.functions.MatVecExpr) $ref).nullSafeEval($c);
         |if (mv == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) mv;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

object MatVecExpr {
  def apply(vec: Column, matrix: Seq[Double], outDim: Int): Column =
    GraftSqlBridge.column(
      MatVecExpr(GraftSqlBridge.expression(vec), matrix, outDim))
}
