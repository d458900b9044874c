package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mojibake repair — the classic crawl-corpus defect where UTF-8 bytes
 * were decoded as Windows-1252/Latin-1 somewhere upstream ("café" →
 * "cafÃ©", "it’s" → "itâ€™s"), fixed by INVERTING that mis-decode:
 * map each char back to the byte a sloppy-cp1252 decode would have
 * produced it from, then strictly re-decode the bytes as UTF-8. The
 * fix applies ONLY when the whole string inverts (every char maps to
 * a byte) and the bytes form VALID UTF-8 that actually changed the
 * string — genuine Latin-script text aborts both tests ("café"'s é
 * becomes byte 0xE9 followed by a space: malformed UTF-8 → returned
 * untouched), so the repair is a no-op on clean corpora. Up to
 * [[FixMojibakeExpr.MaxPasses]] passes undo DOUBLE-encoded mojibake
 * (each pass strictly validated). The same public technique as the
 * ftfy library's core loop, re-derived; inherent caveat (documented
 * there too): a text that LITERALLY means "Ã©" is indistinguishable
 * from mojibake and gets "fixed".
 *
 * The char→byte inverse is an explicit table (cp1252's 27 specials at
 * 0x80–0x9F, identity for the rest of 0x00–0xFF including the five
 * undefined positions a sloppy decoder passes through as C1
 * controls) — no dependence on the JVM charset implementation's
 * undefined-position behavior, engine-deterministic. NULL → NULL;
 * pure per-row projection, codegen'd static call.
 */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = child.dataType
  override def prettyName: String = "fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    FixMojibakeExpr.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixMojibakeExpr.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}

object FixMojibakeExpr {

  /** Double-encoded mojibake needs two passes; three bounds pathology. */
  val MaxPasses = 3

  /** codepoint → sloppy-cp1252 byte for the 0x80–0x9F specials. */
  private val Specials: Map[Int, Int] = Map(
    0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
    0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
    0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
    0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
    0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
    0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
    0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)

  /** Dense inverse table over the BMP chars that can invert. */
  private val Inverse: Array[Int] = {
    val a = Array.fill(0x2200)(-1)
    var c = 0
    while (c < 0x100) { a(c) = c; c += 1 }
    // the cp1252 specials REPLACE the C1 identity only on the decode
    // side; on this inverse side both map back into 0x80–0x9F
    Specials.foreach { case (cp, b) => a(cp) = b }
    a
  }

  private def invert(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val b = if (c < Inverse.length) Inverse(c) else -1
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  private def strictUtf8(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  def fix(text: UTF8String): UTF8String = {
    var cur = text.toString
    var pass = 0
    var changed = false
    var continue = true
    while (continue && pass < MaxPasses) {
      val bytes = invert(cur)
      val dec = if (bytes == null) null else strictUtf8(bytes)
      if (dec == null || dec == cur) continue = false
      else { cur = dec; changed = true }
      pass += 1
    }
    if (changed) UTF8String.fromString(cur) else text
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(FixMojibakeExpr(GraftSqlBridge.expression(c)))
}
