package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode (UAX#29 default rules) word segmentation as a native
 * expression — the multilingual tokenizer arm for every word-keyed
 * operator in this engine. Whitespace splitting collapses CJK text to
 * one "word" per line (Chinese/Japanese write no spaces; Thai too),
 * silently distorting dedup shingles, Gopher word signals, token
 * budgets, and vocabulary counts for multilingual corpora. UAX#29
 * default word boundaries fix the failure mode deterministically and
 * dictionary-free: Han ideographs and Hiragana segment one per
 * character, Katakana and Hangul chain into runs, Latin words keep
 * internal apostrophes/periods ("it's", "3.5"), and punctuation-only
 * segments are dropped (a segment must contain a letter or digit to be
 * a word).
 *
 * Mechanism: `java.text.BreakIterator.getWordInstance(Locale.ROOT)` —
 * JDK-public, locale-independent under ROOT, deterministic for a fixed
 * JDK line (the gate pins exact segmentations of planted CJK/Thai/
 * Latin fixtures as a constant-table oracle, the q_multimodal
 * precedent) — followed by one UAX#29-default correction: the JDK
 * iterator CHAINS runs of Han and Hiragana into a single segment
 * (legacy JDK behavior), which would leave an unpunctuated Chinese
 * sentence one giant token; UAX#29's default rules give those scripts
 * no chaining rule, so each Han/Hiragana codepoint is a word of its
 * own, and this expression subdivides accordingly (Katakana and
 * Hangul keep their UAX#29 run rules). Instances are NOT thread-safe,
 * so evaluation borrows a ThreadLocal iterator; both interpreted and
 * generated code are one static call — a scan-projection citizen like
 * the rest of the text family, no UDF, no shuffle.
 *
 * This is the DEFAULT-rules segmenter (no dictionary): Thai/Lao/Khmer
 * letter runs stay whole rather than splitting at dictionary word
 * boundaries, matching ICU's behavior with dictionaries disabled.
 * That is the documented trade for engine-portable determinism — a
 * dictionary segmenter is a deployment-time [[graft.operators
 * .DocExtract]]-style seam, not a core operator.
 */
case class Uax29WordsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "uax29_words"

  override protected def nullSafeEval(input: Any): Any =
    Uax29WordsExpr.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uax29WordsExpr.segment($c)")

  override protected def withNewChildInternal(newChild: Expression): Uax29WordsExpr =
    copy(child = newChild)
}

object Uax29WordsExpr {

  // BreakIterator instances are mutable and not thread-safe; one per
  // executor thread amortizes the (expensive) construction across rows
  private val local: ThreadLocal[java.text.BreakIterator] =
    ThreadLocal.withInitial(() =>
      java.text.BreakIterator.getWordInstance(java.util.Locale.ROOT))

  private def isSolo(cp: Int): Boolean = {
    val sc = Character.UnicodeScript.of(cp)
    sc == Character.UnicodeScript.HAN || sc == Character.UnicodeScript.HIRAGANA
  }

  /** Word segments of `s` that contain at least one letter or digit
    * (the standard "is a word" test over UAX#29 segments), with Han and
    * Hiragana subdivided one codepoint per word (see class doc). */
  def segment(s: UTF8String): ArrayData = {
    val str = s.toString
    val bi = local.get()
    bi.setText(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(from: Int, to: Int): Unit = {
      var hasWordChar = false
      var i = from
      while (i < to && !hasWordChar) {
        val cp = str.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasWordChar = true
        i += Character.charCount(cp)
      }
      if (hasWordChar) out += UTF8String.fromString(str.substring(from, to))
    }
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      var i = start
      var runStart = start
      while (i < end) {
        val cp = str.codePointAt(i)
        val w = Character.charCount(cp)
        if (isSolo(cp)) {
          if (runStart < i) emit(runStart, i)
          emit(i, i + w)
          runStart = i + w
        }
        i += w
      }
      if (runStart < end) emit(runStart, end)
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Uax29WordsExpr(GraftSqlBridge.expression(c)))
}
