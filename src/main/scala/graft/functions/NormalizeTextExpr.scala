package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused text normalization — the engine's hottest projection
 * ([[Hashing.normalizeText]]/[[Hashing.normalizedWords]], ~37 operator
 * call sites): lowercase, collapse every run of non-[a-z0-9] characters
 * to one space, trim. Byte-for-byte the same result as the portable
 * composite `trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))` it
 * replaces (the DuckDB oracles keep that spelling), in ONE Unicode
 * lowercase + ONE byte scan instead of lowercase + regex NFA rewrite +
 * trim + (for the words arm) a regex split:
 *
 *  - the lowercase is the same `UTF8String.toLowerCase` Spark's `lower`
 *    calls, so Unicode mappings whose result contains ASCII alnum
 *    ('İ' → i + U+0307, Kelvin 'K' → k) behave identically;
 *  - after lowercasing, every character outside [a-z0-9] — including
 *    each byte of any multi-byte character (UTF-8 continuation bytes
 *    are ≥ 0x80) — is a gap byte, and a maximal run of non-alnum
 *    CHARS is exactly a maximal run of non-alnum BYTES, so the byte
 *    scan reproduces the regex's run-collapse.
 *
 * [[NormalizeTextExpr]] returns the normalized STRING (the exact-dedup
 * fingerprint surface); [[NormalizedWordsExpr]] returns the word ARRAY
 * directly (empty for all-gap input — the `when(n === "", array())`
 * guard folded in), skipping the intermediate string and the split.
 * KernelPropertySpec pins both against the composite on random Unicode
 * soups.
 */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      NormalizeTextExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  @inline private def alnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Lowercase + collapse-non-alnum-to-single-space + trim, one scan. */
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var pendingGap = false // a gap run seen since the last emitted word
    while (i < n) {
      val c = b(i)
      if (alnum(c)) {
        if (pendingGap && o > 0) { out(o) = ' '; o += 1 }
        pendingGap = false
        out(o) = c
        o += 1
      } else pendingGap = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** The word array of [[normalize]]d text (maximal alnum runs), empty
    * for all-gap input. */
  def words(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && !alnum(b(i))) i += 1
      val start = i
      while (i < n && alnum(b(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(b, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }
}

/**
 * Byte-scan space split over ALREADY-CANONICAL text (single internal
 * spaces, no leading/trailing — [[NormalizeTextExpr]] output): the word
 * array as maximal runs of non-space bytes, empty for the empty string.
 *
 * Replaces the last regex in the dedup hot path
 * ([[graft.operators.Dedup.wordTable]]'s `split(norm, " ")`): Spark's
 * `StringSplit` decodes the UTF8String to a java String, runs a
 * `Pattern.split`, and re-encodes every token; this slices the bytes
 * directly (0x20 never occurs inside a UTF-8 multi-byte sequence, so a
 * byte scan is a character scan). On canonical input the result is
 * value-identical to `split(norm, " ")` composed with the empty-string
 * guard (regex split of "" yields [""], which wordTable special-cased to
 * []; runs-semantics yields [] natively) — KernelPropertySpec pins the
 * parity. NOT a general split: on non-canonical input (repeated/edge
 * spaces) regex split emits empty tokens, this does not, by design.
 */
case class SpaceSplitExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "space_split"

  override protected def nullSafeEval(input: Any): Any =
    SpaceSplitExpr.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpaceSplitExpr.split($c)")

  override protected def withNewChildInternal(newChild: Expression): SpaceSplitExpr =
    copy(child = newChild)
}

object SpaceSplitExpr {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SpaceSplitExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Maximal non-space byte runs as UTF8String slices, one pass. */
  def split(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val start = i
      while (i < n && b(i) != ' ') i += 1
      if (i > start) out += UTF8String.fromBytes(b, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }
}

/** The array arm of [[NormalizeTextExpr]] — see its scaladoc. */
case class NormalizedWordsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "normalized_words"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.words(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextExpr.words($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizedWordsExpr =
    copy(child = newChild)
}

object NormalizedWordsExpr {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      NormalizedWordsExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
