package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/**
 * Row-level bloom probe over a COLUMN of serialized filters (see
 * [[BloomExprs.mightContainCol]] for when to use it vs the constant
 * form). Left: the serialized `BloomFilterAggregate` binary; right:
 * the long hash to probe. NULL filter or NULL hash → NULL (an all-NULL
 * keys file has a NULL bloom and can never match an equality probe —
 * the [[graft.operators.SkipIndex]] convention filters those rows out
 * explicitly).
 *
 * Each evaluation deserializes the filter (one array copy); that is
 * the per-row price of keeping the probe IN THE PLAN — the
 * alternative collects every candidate's bloom bytes to the driver,
 * which at an 800k-file corpus with a low-selectivity probe is
 * hundreds of GB on one machine.
 */
case class BloomProbeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary filter, got ${left.dataType.catalogString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a long hash, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_col"

  override protected def nullSafeEval(bytes: Any, h: Any): Any =
    BloomProbeExpr.probe(bytes.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomProbeExpr.probe($b, $h)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): BloomProbeExpr =
    copy(left = newLeft, right = newRight)
}

object BloomProbeExpr {
  def probe(bytes: Array[Byte], h: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(h)
}
