package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native sketch-packing expressions over a materialized array<long> of
 * 60-bit element hashes (see [[Md5Long60Expr]]).
 *
 * The equivalent higher-order-function chains are interpreted node by
 * node per array element (no codegen inside HOF lambdas): the MinHash
 * fold touches numHashes × |array| lambda frames and the SimHash bit
 * vote 60 × |array|. These expressions do the same arithmetic in one
 * eval call as tight JVM loops — identical values (the specs pin
 * equality against the Column-chain forms), an order of magnitude less
 * interpretation overhead.
 */
object SketchExprs {

  /** XOR seed for MinHash family member i: md5_60(i), as in
    * Dedup.minHashSignatureOfHashes (constant-folded there, precomputed
    * here). */
  def seed(i: Int): Long = Md5Long60Expr.hash(UTF8String.fromString(i.toString))

  private[functions] def checkLongArray(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires array<bigint>, got ${other.catalogString}")
    }
}

/**
 * MinHash signature from base hashes: element i of the result is
 * min over hashes h of (h XOR md5_60(i)). NULL for an empty input
 * (mirrors Dedup.minHashSignatureOfHashes' guard). NULL elements inside
 * the input are ignored, matching array_min's null-skipping.
 */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExprs.checkLongArray(child, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(SketchExprs.seed)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = h ^ seeds(s)
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = ((graft.functions.MinHashSignatureExpr) $ref).nullSafeEval($c);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  def apply(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignatureExpr(GraftSqlBridge.expression(hashes), numHashes))
}

/**
 * 60-bit SimHash packed from word hashes: bit b of the result is set when
 * more word hashes have bit b set than clear. Empty input → 0L (mirrors
 * Dedup.simHashOfHashes' guard). NULL elements are skipped.
 */
case class SimHashPackExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExprs.checkLongArray(child, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        total += 1
        var b = 0
        while (b < 60) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      // strictly more set than clear: vote sum (+1/-1) must be positive
      if (2 * votes(b) > total) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this)
    defineCodeGen(ctx, ev,
      c => s"((Long) ((graft.functions.SimHashPackExpr) $ref).nullSafeEval($c)).longValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashPackExpr =
    copy(child = newChild)
}

object SimHashPackExpr {
  def apply(hashes: Column): Column =
    GraftSqlBridge.column(SimHashPackExpr(GraftSqlBridge.expression(hashes)))
}
