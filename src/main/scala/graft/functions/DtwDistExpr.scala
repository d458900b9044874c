package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Banded dynamic-time-warping distance (Sakoe & Chiba 1978) between two
 * numeric series: the minimum accumulated |aᵢ − bⱼ| cost over monotone
 * alignments whose warp stays within `band` of the diagonal — THE
 * similarity measure for series that drift in phase (a latency spike
 * one bucket late, a usage pattern shifted by a day), where aligned
 * metrics (L2 over [[graft.streaming.Events.seriesVectors]] grids)
 * punish the shift itself. The band is both the standard accuracy
 * knob and the cost bound: O(n·band) work per pair instead of O(n·m),
 * and at `band = 0` over equal lengths the measure degenerates to the
 * plain Manhattan distance (DtwSpec pins that identity).
 *
 * NULL when either side is NULL/empty, an element is NULL, or the
 * length gap exceeds the band (no feasible path — a filterable
 * non-answer, the [[L2DistSqExpr]] length-mismatch convention, not an
 * error). One fused JVM kernel per pair via the reference-object
 * codegen pattern, so it stays inside whole-stage codegen like the
 * other distance expressions.
 */
case class DtwDistExpr(left: Expression, right: Expression, band: Int)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (band < 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName band must be >= 0: $band")
    else (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires numeric arrays, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dtw_dist"

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
    val m = b.numElements()
    if (n == 0 || m == 0) return null
    if (math.abs(n - m) > band) return null // no path inside the band
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < m) { if (b.isNullAt(j)) return null; j += 1 }
    val inf = Double.PositiveInfinity
    var prev = new Array[Double](m + 1)
    var cur = new Array[Double](m + 1)
    java.util.Arrays.fill(prev, inf)
    prev(0) = 0.0
    i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - band)
      // Long arithmetic: i + band overflows Int for band near Int.MaxValue
      // (the "unbanded" spelling), which would wrap negative and skip the
      // inner loop entirely, silently returning Infinity
      val hi = math.min(m.toLong, i.toLong + band).toInt
      val ai = get(a, i - 1, leftType)
      j = lo
      while (j <= hi) {
        val cost = math.abs(ai - get(b, j - 1, rightType))
        var best = prev(j) // insertion
        if (cur(j - 1) < best) best = cur(j - 1) // deletion
        if (prev(j - 1) < best) best = prev(j - 1) // match
        cur(j) = cost + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) // finite: band >= |n - m| guarantees a feasible path
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dtwExpr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // freshName, not a fixed local: two dtw_dist calls in one projection
      // would otherwise declare duplicate `Object d` and fail codegen
      // compilation (silent interpreted fallback)
      val d = ctx.freshName("dtw")
      s"""
         |Object $d = ((graft.functions.DtwDistExpr) $ref).nullSafeEval($l, $r);
         |if ($d == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((Double) $d).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DtwDistExpr =
    copy(left = newLeft, right = newRight)
}

object DtwDistExpr {
  def apply(a: Column, b: Column, band: Int): Column =
    GraftSqlBridge.column(
      DtwDistExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), band))
}
