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
 *  - stripped of trailing blanks (space/tab/CR) it ends in one of the
 *    `terminators` codepoints. The paper's rule is the ASCII set
 *    `.` `!` `?` `"` ([[C4LinesExpr.AsciiTerminators]], the default) —
 *    ENGLISH-ONLY BY DESIGN: on CJK prose it deletes every line
 *    (。！？ are different codepoints). [[C4LinesExpr.CjkTerminators]]
 *    extends it with the CJK/full-width marks; any codepoint string
 *    works (each codepoint is one terminator);
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
 * strip, word counting, and both needle scans fused). The needle
 * scans stay byte-level codepoint-safe (pure-ASCII needles never
 * alias UTF-8 continuation bytes); the terminal check is a byte-exact
 * SUFFIX match of each terminator's UTF-8 encoding, so multi-byte
 * terminators are matched whole — a continuation byte shared with
 * another character cannot fake a match because the full sequence
 * must align with the stripped line end.
 */
case class C4LinesExpr(
  child: Expression,
  minWords: Int,
  terminators: String = C4LinesExpr.AsciiTerminators
) extends UnaryExpression {

  require(minWords >= 1, s"minWords must be >= 1: $minWords")
  require(terminators.nonEmpty,
    "terminators must name at least one line-terminal codepoint " +
      "(C4LinesExpr.AsciiTerminators is the paper's English rule; " +
      "CjkTerminators adds the CJK/full-width marks)")

  @transient private lazy val termBytes: Array[Array[Byte]] =
    C4LinesExpr.terminatorBytes(terminators)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = C4LinesExpr.Schema

  override def prettyName: String = "c4_lines"

  override protected def nullSafeEval(input: Any): Any =
    C4LinesExpr.scan(input.asInstanceOf[UTF8String], minWords, termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val terms = ctx.addReferenceObj("c4Terminators", termBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.C4LinesExpr.scan($c, $minWords, $terms)")
  }

  override protected def withNewChildInternal(newChild: Expression): C4LinesExpr =
    copy(child = newChild)
}

object C4LinesExpr {

  /** The paper's terminal-punctuation set — English-only by design. */
  val AsciiTerminators: String = ".!?\""

  /** ASCII set + the CJK/full-width terminal marks: 。(ideographic full
    * stop) ！？(full-width) … (horizontal ellipsis) 」』(quote closes)
    * ．(full-width period). The documented arm for corpora that
    * tokenize with UAX#29 — see CurationPipeline's config guard. */
  val CjkTerminators: String = ".!?\"。！？…」』．"

  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("flagged", BooleanType, nullable = false)
  ))

  private val Javascript = "javascript".getBytes("US-ASCII")
  private val LoremIpsum = "lorem ipsum".getBytes("US-ASCII")

  /** One UTF-8 byte sequence per terminator CODEPOINT (astral-safe). */
  def terminatorBytes(terminators: String): Array[Array[Byte]] =
    terminators.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)).getBytes("UTF-8"))

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

  /** Does the byte range [lineStart, last] end with any terminator's
    * full UTF-8 sequence? */
  private def endsWithTerminator(
    b: Array[Byte], lineStart: Int, last: Int,
    terms: Array[Array[Byte]]): Boolean = {
    var t = 0
    while (t < terms.length) {
      val term = terms(t)
      val from = last - term.length + 1
      if (from >= lineStart) {
        var j = 0
        var ok = true
        while (ok && j < term.length) {
          if (b(from + j) != term(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      t += 1
    }
    false
  }

  def scan(
    text: UTF8String, minWords: Int,
    terms: Array[Array[Byte]]): GenericInternalRow = {
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
        endsWithTerminator(b, lineStart, last, terms)
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
    apply(c, minWords, AsciiTerminators)

  def apply(c: Column, minWords: Int, terminators: String): Column =
    GraftSqlBridge.column(
      C4LinesExpr(GraftSqlBridge.expression(c), minWords, terminators))
}
