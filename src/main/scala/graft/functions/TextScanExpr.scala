package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass native text scan: every ASCII-class count the quality/token
 * operators need, from a single traversal of the string's UTF-8 BYTES —
 * no regex engine, no intermediate strings, no code-point decoding
 * (ASCII classes are single bytes; a non-ASCII lead byte counts as one
 * code point of class OTHER, continuation bytes are skipped).
 *
 * Returns a struct of:
 *  - `n_chars`        code points (≡ Spark `length`)
 *  - `n_alpha`        code points in [A-Za-z]
 *  - `n_other`        code points NOT in [A-Za-z0-9] and not Java `\s`
 *                     (the numerator `length(regexp_replace(c,
 *                     "[A-Za-z0-9\\s]", "")) ` computes by allocation)
 *  - `ws_tokens`      maximal non-whitespace runs (≡ `size(split(trim(c),
 *                     "\\s+"))` with the blank→0 convention)
 *  - `bpeish_tokens`  matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` —
 *                     alpha runs + digit runs + every other
 *                     non-whitespace code point singly
 *
 * Why: the sf1 full-board sweep (BASELINE.md round-11) showed the two
 * regex-engine projections as the only non-IO exponent-≈1.0 cells —
 * correct scale SHAPE (scan-bound, shuffle-free) but paying
 * `java.util.regex` per byte, plus a full stripped-string ALLOCATION
 * per doc for each ratio. One fused scan serves q_token_count and
 * q_text_quality; whitespace is Java `\s` = [ \t\n\x0B\f\r], matching
 * the regex spellings it replaces.
 */
case class TextScanExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = TextScanExpr.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "text_scan"

  override protected def nullSafeEval(input: Any): Any =
    TextScanExpr.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TextScanExpr$$.MODULE$$.scan($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TextScanExpr =
    copy(child = newChild)
}

object TextScanExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_other", IntegerType, nullable = false),
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpeish_tokens", IntegerType, nullable = false)))

  def apply(c: Column): Column =
    GraftSqlBridge.column(TextScanExpr(GraftSqlBridge.expression(c)))

  // character classes (ASCII); non-ASCII code points are OTHER
  private final val WS = 0
  private final val ALPHA = 1
  private final val DIGIT = 2
  private final val OTHER = 3
  private final val START = -1

  /** Java `\s`: space, tab, LF, VT, FF, CR. */
  @inline private def isWs(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def scan(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    var nChars = 0
    var nAlpha = 0
    var nOther = 0
    var wsTokens = 0
    var bpeish = 0
    var prev = START // class of the previous CODE POINT
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b >= 0x80 && b < 0xc0) {
        // UTF-8 continuation byte: part of the current (OTHER) code point
        i += 1
      } else {
        val cls =
          if (b < 0x80) {
            if (isWs(b)) WS
            else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) ALPHA
            else if (b >= '0' && b <= '9') DIGIT
            else OTHER
          } else OTHER // non-ASCII lead byte: one code point, class OTHER
        nChars += 1
        if (cls == ALPHA) {
          nAlpha += 1
          if (prev != ALPHA) bpeish += 1 // alpha run starts
        } else if (cls == DIGIT) {
          if (prev != DIGIT) bpeish += 1 // digit run starts
        } else if (cls == OTHER) {
          nOther += 1
          bpeish += 1 // each such code point is its own token
        }
        if (cls != WS && (prev == WS || prev == START)) wsTokens += 1
        prev = cls
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nChars, nAlpha, nOther, wsTokens, bpeish))
  }
}
