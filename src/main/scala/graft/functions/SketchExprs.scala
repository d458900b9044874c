package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
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
  // NULL is possible even for a non-null child (empty input array) —
  // without this override codegen would emit an unassignable isNull for
  // non-nullable children and the schema would falsely claim non-null
  override def nullable: Boolean = true
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

/**
 * Fused word-shingling + hashing: the 60-bit MD5 hash of every k-word
 * shingle of `words`, with the under-k fallback hashing `norm` whole —
 * value-identical to
 * `Md5Long60ArrayExpr(Dedup.shinglesOf(norm, words, k))` (HashingSpec
 * pins it), but the shingle STRINGS are never built: each window feeds
 * the MD5 digest incrementally (word bytes + single-space separators, so
 * the digest input is exactly the concat_ws(" ", window) string — NULL
 * words are skipped like concat_ws does). Word bytes are extracted once
 * per row and reused across the k windows each word appears in, where
 * the expression-chain form re-materializes every shingle via
 * slice+concat_ws (O(words × k) string allocation per document).
 *
 * left = the word array (array<string>), right = the normalized text the
 * words came from (string); both from Dedup.wordTable, which derives
 * them from the same text column so they are null together.
 */
case class ShingleHashExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), _: StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val space = Array[Byte](' ')

  override protected def nullSafeEval(wordsIn: Any, normIn: Any): Any = {
    val arr = wordsIn.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k)
      return new GenericArrayData(
        Array(Md5Long60Expr.hash(normIn.asInstanceOf[UTF8String])))
    // word bytes once per row; null words stay null and are skipped per
    // window below, mirroring concat_ws
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) wb(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var j = 0
    while (j <= n - k) {
      val md = Md5Long60Expr.freshDigest()
      var first = true
      var w = j
      while (w < j + k) {
        if (wb(w) != null) {
          if (!first) md.update(space)
          md.update(wb(w))
          first = false
        }
        w += 1
      }
      out(j) = Md5Long60Expr.long60(md.digest())
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleExpr", this)
    defineCodeGen(ctx, ev, (w, s) =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.ShingleHashExpr) $ref).nullSafeEval($w, $s)")
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): ShingleHashExpr =
    copy(left = newLeft, right = newRight)
}

object ShingleHashExpr {
  def apply(words: Column, norm: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashExpr(
      GraftSqlBridge.expression(words), GraftSqlBridge.expression(norm), k))
}

/**
 * Sign-random-projection bucket key over a numeric vector, all `planes`
 * hyperplanes fused into ONE loop over the dimensions. Plane p's ±1
 * weight for dimension i is bit p of md5_60(i) — identical to
 * Dedup.hyperplaneBucketOf over Dedup.dimHashes, which unrolls into
 * `planes` separate interpreted aggregate(zip_with(...)) chains, each
 * re-walking the vector (planes × dim lambda frames per row). Here the
 * per-dimension hash is computed once per DIMENSION INDEX (cached across
 * rows — the portable form re-digests every dimension of every row) and
 * each element updates all plane accumulators in one pass.
 *
 * Value-identical to the portable form (HashingSpec pins this),
 * including its edge cases: empty vector → all-'0' key (every dot is the
 * 0.0 fold seed), any NULL element → all-'0' key (the lambda dot goes
 * NULL and `when(dot > 0, ...)` falls to '0'), NaN element → '0' planes
 * (NaN > 0 is false). Accumulation is per-plane in element order, so the
 * floating-point sums match the lambda chain bit for bit. ONE documented
 * divergence: a NULL input VECTOR is null-propagated here, where the
 * portable chain's otherwise('0') folds it into the all-'0' key — both
 * are discarded by the downstream cosine verify either way.
 */
case class HyperplaneBucketExpr(child: Expression, planes: Int)
  extends UnaryExpression {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (planes < 1 || planes > 60)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports 1..60 planes (one bit of md5_60 per plane), got $planes")
    else if (elemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric array, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val elemT: DataType = elemType.get

  // Per-dimension hash cache, shared across rows and threads: grown on
  // demand, published via the atomic reference (an array is never mutated
  // after publication). Growth copies the existing prefix and installs
  // via CAS, so a concurrent grow to a SMALLER dimension can never
  // clobber a larger cached array (which would re-derive hashes forever
  // under mixed-width inputs).
  @transient private lazy val dimHashCache =
    new java.util.concurrent.atomic.AtomicReference[Array[Long]](Array.emptyLongArray)

  private def dimHashes(n: Int): Array[Long] = {
    var cur = dimHashCache.get()
    while (cur.length < n) {
      val next = java.util.Arrays.copyOf(cur, n)
      var i = cur.length
      while (i < n) {
        next(i) = Md5Long60Expr.hash(UTF8String.fromString(i.toString))
        i += 1
      }
      if (dimHashCache.compareAndSet(cur, next)) cur = next
      else cur = dimHashCache.get() // lost the race; retry against the winner
    }
    cur
  }

  private def get(arr: ArrayData, i: Int): Double = elemT match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  @transient private lazy val allZeros: UTF8String =
    UTF8String.fromString("0" * planes)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = dimHashes(n)
    val dots = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return allZeros
      val x = get(arr, i)
      val h = hs(i)
      var p = 0
      while (p < planes) {
        // x * (+1.0|-1.0) of the portable form, exactly (fp-neutral)
        dots(p) += (if (((h >> p) & 1L) == 1L) x else -x)
        p += 1
      }
      i += 1
    }
    val out = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      out(p) = if (dots(p) > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.unsafe.types.UTF8String) " +
        s"((graft.functions.HyperplaneBucketExpr) $ref).nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

object HyperplaneBucketExpr {
  def apply(vec: Column, planes: Int): Column =
    GraftSqlBridge.column(
      HyperplaneBucketExpr(GraftSqlBridge.expression(vec), planes))
}

/**
 * Mean dense-spine weight over 60-bit gram hashes:
 * `(Σ_h weights[h mod D]) / n` over the non-null elements, NULL for an
 * empty input — the evaluation core of
 * [[graft.operators.QualityClassifier.scoreInline]]. The equivalent
 * `aggregate` higher-order function pays an interpreted lambda frame
 * per element (and `element_at` on a MAP literal a linear key scan per
 * lookup); this is one tight primitive loop over an O(1)-indexed
 * weight array.
 */
case class BucketMeanExpr(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  // fail at construction, not as a per-row ArithmeticException from
  // `% 0` at eval time — the expression is public beyond the callers
  // that pre-validate via requireDenseBucketSpine
  require(weights.nonEmpty, "bucket_mean needs at least one weight")

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExprs.checkLongArray(child, prettyName)

  override def dataType: DataType = DoubleType
  // NULL on empty input even for a non-null child
  override def nullable: Boolean = true
  override def prettyName: String = "bucket_mean"

  @transient private lazy val w: Array[Double] = weights.toArray
  @transient private lazy val d: Long = weights.size.toLong

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sum = 0.0
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = arr.getLong(i) % d
        sum += w((if (m < 0) m + d else m).toInt)
        cnt += 1
      }
      i += 1
    }
    if (cnt == 0) null else java.lang.Double.valueOf(sum / cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketMeanExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = ((graft.functions.BucketMeanExpr) $ref).nullSafeEval($c);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((java.lang.Double) r).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketMeanExpr =
    copy(child = newChild)
}

object BucketMeanExpr {
  def apply(hashes: Column, weights: Seq[Double]): Column =
    GraftSqlBridge.column(
      BucketMeanExpr(GraftSqlBridge.expression(hashes), weights))
}
