package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode (UAX#29 default rules) SENTENCE segmentation as a native
 * expression — the companion of [[Uax29WordsExpr]] one level up: the
 * boundary primitive behind sentence-preserving chunking
 * ([[graft.operators.Chunking.chunkBySentences]]), per-sentence dedup
 * keys, and display snippets. Splitting on `[.!?]` misdraws the lines
 * a real corpus actually has — "Dr." vs end-of-sentence, CJK 。,
 * terminators inside quotes — where UAX#29's default sentence rules
 * (java.text.BreakIterator.getSentenceInstance under Locale.ROOT:
 * JDK-public, locale-independent, deterministic for a fixed JDK line)
 * handle the standard cases: a terminator followed by lowercase does
 * NOT break ("A. b stays joined"), ideographic 。 breaks, an
 * unterminated tail is its own sentence.
 *
 * Contract: the segments are a LOSSLESS PARTITION of the input —
 * trailing whitespace after a terminator stays attached to its
 * sentence and `concat(sentences) == input` always (pinned by spec on
 * random strings), so any downstream regrouping (chunking!) can
 * reconstruct exact document text with zero bookkeeping. Empty string
 * → empty array; NULL → NULL. No trimming, no filtering — callers
 * trim if display wants it. Like the word arm, instances are not
 * thread-safe, so evaluation borrows a ThreadLocal iterator; both
 * interpreted and generated code are one static call.
 */
case class Uax29SentencesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "uax29_sentences"

  override protected def nullSafeEval(input: Any): Any =
    Uax29SentencesExpr.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uax29SentencesExpr.segment($c)")

  override protected def withNewChildInternal(newChild: Expression): Uax29SentencesExpr =
    copy(child = newChild)
}

object Uax29SentencesExpr {

  private val local: ThreadLocal[java.text.BreakIterator] =
    ThreadLocal.withInitial(() =>
      java.text.BreakIterator.getSentenceInstance(java.util.Locale.ROOT))

  /** Sentence segments of `s`: a lossless partition (concat == s). */
  def segment(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return new GenericArrayData(Array.empty[Any])
    val bi = local.get()
    bi.setText(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      out += UTF8String.fromString(str.substring(start, end))
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Uax29SentencesExpr(GraftSqlBridge.expression(c)))
}
