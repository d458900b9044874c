package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Sakoe–Chiba band envelope of a series — the QUERY-INDEPENDENT half of
 * the LB_Keogh kernel ([[LbKeoghExpr]]), factored out so a persisted DTW
 * search artifact ([[graft.operators.Similarity.dtwEnvelopeIndex]]) can
 * pay it ONCE per corpus series instead of once per (query, series)
 * probe pair: position `j` holds the max (`upper = true`) or min of the
 * series over the banded window `[j − band, j + band]`, for `j` in
 * `[0, len + band)` — the extra `band` tail positions let the bound side
 * be up to `band` elements LONGER than the enveloped series, exactly the
 * length slack the banded DTW recurrence admits. Monotonic-deque sliding
 * extrema (Lemire 2006), O(len + band).
 *
 * NULL for NULL/empty input or any NULL element — the [[DtwDistExpr]]
 * convention, so an indexed series with no feasible DTW partner carries
 * NULL envelopes and [[LbKeoghEnvExpr]] screens it out as NULL, exactly
 * where the fused [[LbKeoghExpr]] would.
 */
case class DtwEnvelopeExpr(child: Expression, band: Int, upper: Boolean)
  extends UnaryExpression {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (band < 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName band must be >= 0: $band")
    else if (elemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric array, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (upper) "dtw_env_upper" else "dtw_env_lower"

  @transient private lazy val et = elemType.get

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val v = new Array[Double](n)
    i = 0
    et match {
      case DoubleType => while (i < n) { v(i) = arr.getDouble(i); i += 1 }
      case FloatType => while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
      case LongType => while (i < n) { v(i) = arr.getLong(i).toDouble; i += 1 }
      case _ => while (i < n) { v(i) = arr.getInt(i).toDouble; i += 1 }
    }
    val outLen = n + band
    val out = new Array[Double](outLen)
    // monotonic deque of indices; values decreasing for upper, increasing
    // for lower — head is the window extremum
    val dq = new Array[Int](n + 1)
    var head = 0
    var tail = 0
    var next = 0 // next series index to admit
    var j = 0
    while (j < outLen) {
      val end = math.min(n - 1, j + band)
      while (next <= end) {
        val x = v(next)
        if (upper) while (tail > head && v(dq(tail - 1)) <= x) tail -= 1
        else while (tail > head && v(dq(tail - 1)) >= x) tail -= 1
        dq(tail) = next; tail += 1
        next += 1
      }
      val lo = j - band
      while (dq(head) < lo) head += 1
      out(j) = v(dq(head))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("envExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("dtwEnv")
      s"""
         |Object $v = ((graft.functions.DtwEnvelopeExpr) $ref).nullSafeEval($c);
         |if ($v == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $v;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DtwEnvelopeExpr =
    copy(child = newChild)
}

object DtwEnvelopeExpr {
  def apply(series: Column, band: Int, upper: Boolean): Column =
    GraftSqlBridge.column(
      DtwEnvelopeExpr(GraftSqlBridge.expression(series), band, upper))
}

/**
 * One-sided LB_Keogh bound of a series against a PRECOMPUTED
 * [[DtwEnvelopeExpr]] envelope pair: `Σ_j dist(series(j), [lo(j), up(j)])`
 * — O(|series|) per pair with the deque work already paid at index-build
 * time. `graft.operators.Similarity.dtwTopKPrunedOver` takes the max of
 * the two one-sided forms (stored corpus envelope queried by the series,
 * and the query's own envelope queried by the stored series), which a
 * spec pins EQUAL to the fused [[LbKeoghExpr]] bit for bit.
 *
 * The enveloped series' length is `up.length − band` (the envelope
 * carries its band's tail slack), so the band-infeasibility NULL
 * (`|n − m| > band`) is decidable from the stored rows alone. NULL
 * exactly where [[LbKeoghExpr]] is: either side NULL/empty, a NULL
 * element, or the length gap over the band — plus a fail-loud guard on
 * an up/lo length mismatch (a corrupt artifact, never a data case).
 */
case class LbKeoghEnvExpr(
  series: Expression,
  up: Expression,
  lo: Expression,
  band: Int
) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = series
  override def second: Expression = up
  override def third: Expression = lo
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lb_keogh_env"

  private def seriesElemType: Option[DataType] = series.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (band < 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName band must be >= 0: $band")
    else if (seriesElemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric series array, got ${series.dataType.catalogString}")
    else if (!isDoubleArray(up) || !isDoubleArray(lo))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double-array envelopes (DtwEnvelopeExpr output), " +
          s"got ${up.dataType.catalogString} and ${lo.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val et = seriesElemType.get

  override protected def nullSafeEval(s: Any, u: Any, l: Any): Any =
    compute(s.asInstanceOf[ArrayData], u.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  def compute(sArr: ArrayData, uArr: ArrayData, lArr: ArrayData): Any = {
    val m = sArr.numElements()
    if (m == 0) return null
    val envLen = uArr.numElements()
    require(lArr.numElements() == envLen,
      s"$prettyName: up/lo envelope lengths differ ($envLen vs " +
        s"${lArr.numElements()}) - corrupt envelope artifact")
    val n = envLen - band
    if (n <= 0) return null // envelope of an empty/invalid series
    if (math.abs(n - m) > band) return null // no path inside the band
    var j = 0
    while (j < m) { if (sArr.isNullAt(j)) return null; j += 1 }
    var lb = 0.0
    j = 0
    while (j < m) {
      val cj = et match {
        case DoubleType => sArr.getDouble(j)
        case FloatType => sArr.getFloat(j).toDouble
        case LongType => sArr.getLong(j).toDouble
        case _ => sArr.getInt(j).toDouble
      }
      val u = uArr.getDouble(j)
      val l = lArr.getDouble(j)
      if (cj > u) lb += cj - u
      else if (cj < l) lb += l - cj
      j += 1
    }
    lb
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lbEnvExpr", this)
    nullSafeCodeGen(ctx, ev, (s, u, l) => {
      val v = ctx.freshName("lbEnv")
      s"""
         |Object $v = ((graft.functions.LbKeoghEnvExpr) $ref)
         |  .compute((org.apache.spark.sql.catalyst.util.ArrayData) $s,
         |           (org.apache.spark.sql.catalyst.util.ArrayData) $u,
         |           (org.apache.spark.sql.catalyst.util.ArrayData) $l);
         |if ($v == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((Double) $v).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newFirst: Expression, newSecond: Expression, newThird: Expression): LbKeoghEnvExpr =
    copy(series = newFirst, up = newSecond, lo = newThird)
}

object LbKeoghEnvExpr {
  def apply(series: Column, up: Column, lo: Column, band: Int): Column =
    GraftSqlBridge.column(LbKeoghEnvExpr(
      GraftSqlBridge.expression(series),
      GraftSqlBridge.expression(up),
      GraftSqlBridge.expression(lo), band))
}
