package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native C4-style line cleaning (Raffel et al. 2020, "Exploring the
 * Limits of Transfer Learning with a Unified Text-to-Text Transformer"
 * §2.2 — the public heuristics behind the C4 corpus): one pass over a
 * document's lines keeping only the ones that read like prose, plus
 * the two page-level poison flags. Exactly the rules a crawl-shaped
 * corpus needs before any hash-keyed stage — menus, cookie banners,
 * and share buttons otherwise dominate shingles and line-dedup tables.
 *
 * A line is KEPT iff all of:
 *  - stripped of trailing blanks (space/tab/CR) it ends in a terminal
 *    punctuation mark: `.` `!` `?` or `"` (the paper's rule);
 *  - it has at least `minWords` words, a word being a maximal run of
 *    non-blank characters (blank = space or tab — the oracle mirrors
 *    this exactly via replace+split);
 *  - it does not contain "javascript" (ASCII case-insensitive — the
 *    paper drops any line with the word).
 *
 * Returns struct<text string, n_kept int, flagged boolean>: `text` is
 * the kept lines joined by `\n` (original line bytes, untrimmed),
 * `n_kept` their count (the page-level "fewer than N lines" gate —
 * the paper counts sentences; lines-that-survived is the standard
 * public approximation, e.g. TensorFlow Datasets' c4.py), `flagged`
 * is the page-level rule: the document contains `{` (code) or
 * "lorem ipsum" (ASCII case-insensitive, placeholder text) anywhere —
 * including on lines the line rules already dropped, per the paper
 * ("any page" containing them is removed entirely).
 *
 * NULL input → NULL. Pure per-row projection, one codegen'd call,
 * single scan over the UTF-8 bytes (line splitting, trailing-blank
 * strip, word counting, and both needle scans fused; needles are
 * ASCII so the byte-level scan is codepoint-safe — no UTF-8
 * continuation byte can alias an ASCII value).
 */
case class C4LinesExpr(child: Expression, minWords: Int)
  extends UnaryExpression {

  require(minWords >= 1, s"minWords must be >= 1: $minWords")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = C4LinesExpr.Schema

  override def prettyName: String = "c4_lines"

  override protected def nullSafeEval(input: Any): Any =
    C4LinesExpr.scan(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.C4LinesExpr.scan($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): C4LinesExpr =
    copy(child = newChild)
}

object C4LinesExpr {

  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("flagged", BooleanType, nullable = false)
  ))

  private val Javascript = "javascript".getBytes("US-ASCII")
  private val LoremIpsum = "lorem ipsum".getBytes("US-ASCII")

  /** ASCII-case-insensitive needle scan over raw UTF-8 bytes from
    * `from` until `until`; safe because the needles are pure ASCII and
    * UTF-8 continuation bytes never collide with ASCII values. */
  private def containsAscii(
    b: Array[Byte], from: Int, until: Int, needle: Array[Byte]): Boolean = {
    val n = needle.length
    var i = from
    while (i + n <= until) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        var c = b(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
        if (c != needle(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  private def isBlank(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\r'

  def scan(text: UTF8String, minWords: Int): GenericInternalRow = {
    val b = text.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n)
    var kept = 0
    var flagged = false
    var lineStart = 0
    while (lineStart <= n) {
      var lineEnd = lineStart
      while (lineEnd < n && b(lineEnd) != '\n') lineEnd += 1
      // page-level poison flags look at EVERY line, kept or not
      if (!flagged) {
        var i = lineStart
        while (!flagged && i < lineEnd) {
          if (b(i) == '{') flagged = true
          i += 1
        }
        if (!flagged && containsAscii(b, lineStart, lineEnd, LoremIpsum))
          flagged = true
      }
      // trailing-blank strip (space/tab/CR), then the three line rules
      var last = lineEnd - 1
      while (last >= lineStart && isBlank(b(last))) last -= 1
      val terminal = last >= lineStart &&
        (b(last) == '.' || b(last) == '!' || b(last) == '?' || b(last) == '"')
      if (terminal) {
        var words = 0
        var inWord = false
        var i = lineStart
        while (i < lineEnd) {
          val blank = b(i) == ' ' || b(i) == '\t'
          if (!blank && !inWord) { words += 1; inWord = true }
          else if (blank) inWord = false
          i += 1
        }
        if (words >= minWords &&
            !containsAscii(b, lineStart, lineEnd, Javascript)) {
          if (kept > 0) out.write('\n')
          out.write(b, lineStart, lineEnd - lineStart)
          kept += 1
        }
      }
      lineStart = lineEnd + 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), kept, flagged))
  }

  def apply(c: Column, minWords: Int): Column =
    GraftSqlBridge.column(C4LinesExpr(GraftSqlBridge.expression(c), minWords))
}
