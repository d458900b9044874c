package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * LB_Keogh lower bound (Keogh & Ratanamahatana 2005) on the banded DTW
 * distance of [[DtwDistExpr]] — the cheap screen of the two-stage exact
 * DTW search ([[graft.operators.Similarity.dtwTopKPruned]]): for every
 * position of one series, any feasible warping within the Sakoe–Chiba
 * band must align it to SOME element of the other series' banded
 * window, so its cost is at least its distance to the window's
 * [min, max] envelope — and a DTW path covers every row AND every
 * column, so those per-position floors sum to a true lower bound on
 * the accumulated L1 cost. This expression returns the MAX of the two
 * one-sided bounds (envelope of the left series queried by the right,
 * and vice versa) — each is valid, so their max is, and the symmetric
 * form screens tighter for free.
 *
 * Envelopes are built with monotonic-deque sliding min/max (Lemire
 * 2006), so the kernel is O(n + m) — genuinely cheaper than the
 * O(n·band) DTW recurrence it screens for, not a constant-factor
 * shave. At `band = 0` over equal lengths the envelope degenerates to
 * the series itself and the bound EQUALS the plain Manhattan distance
 * = the exact DTW at band 0 (DtwSpec pins the identity).
 *
 * NULL exactly when [[DtwDistExpr]] is NULL (either side NULL/empty, a
 * NULL element, length gap over the band), so `lb IS NOT NULL` and
 * `dtw IS NOT NULL` select the same pairs and the two-stage search
 * never drops a pair the exact pass would score.
 */
case class LbKeoghExpr(left: Expression, right: Expression, band: Int)
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
  override def prettyName: String = "lb_keogh"

  @transient private lazy val leftType = elemType(left).get
  @transient private lazy val rightType = elemType(right).get

  private def toDoubles(arr: ArrayData, t: DataType): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    t match {
      case DoubleType => while (i < n) { out(i) = arr.getDouble(i); i += 1 }
      case FloatType => while (i < n) { out(i) = arr.getFloat(i).toDouble; i += 1 }
      case LongType => while (i < n) { out(i) = arr.getLong(i).toDouble; i += 1 }
      case _ => while (i < n) { out(i) = arr.getInt(i).toDouble; i += 1 }
    }
    out
  }

  /** One-sided bound: sum over positions j of `c` of the distance to
    * the [min, max] envelope of `q` over the banded window
    * [j − band, j + band] — sliding-extrema deques, O(|q| + |c|). */
  private def oneSided(c: Array[Double], q: Array[Double]): Double = {
    val m = c.length
    val n = q.length
    // ring-buffer deques of q indices: maxDq values decreasing,
    // minDq values increasing
    val cap = n + 1
    val maxDq = new Array[Int](cap); var maxHead = 0; var maxTail = 0
    val minDq = new Array[Int](cap); var minHead = 0; var minTail = 0
    var next = 0 // next q index to admit
    var lb = 0.0
    var j = 0
    while (j < m) {
      val end = math.min(n.toLong - 1, j.toLong + band).toInt
      while (next <= end) {
        val v = q(next)
        while (maxTail > maxHead && q(maxDq(maxTail - 1)) <= v) maxTail -= 1
        maxDq(maxTail) = next; maxTail += 1
        while (minTail > minHead && q(minDq(minTail - 1)) >= v) minTail -= 1
        minDq(minTail) = next; minTail += 1
        next += 1
      }
      val lo = j - band // window lower edge; Int is safe (j, band >= 0 small)
      while (maxDq(maxHead) < lo) maxHead += 1
      while (minDq(minHead) < lo) minHead += 1
      val u = q(maxDq(maxHead))
      val l = q(minDq(minHead))
      val cj = c(j)
      if (cj > u) lb += cj - u
      else if (cj < l) lb += l - cj
      j += 1
    }
    lb
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
    val av = toDoubles(a, leftType)
    val bv = toDoubles(b, rightType)
    math.max(oneSided(bv, av), oneSided(av, bv))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lbExpr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val v = ctx.freshName("lbk")
      s"""
         |Object $v = ((graft.functions.LbKeoghExpr) $ref).nullSafeEval($l, $r);
         |if ($v == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((Double) $v).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): LbKeoghExpr =
    copy(left = newLeft, right = newRight)
}

object LbKeoghExpr {
  def apply(a: Column, b: Column, band: Int): Column =
    GraftSqlBridge.column(
      LbKeoghExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), band))
}
