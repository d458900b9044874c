package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
 * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
 * 2003; the public algorithm behind MOSS): character k-gram rolling
 * hashes, then from every window of `w` consecutive hashes select the
 * MINIMUM (rightmost position on ties), keeping the distinct
 * selections. The paper's guarantee: any substring match of length
 * ≥ w + k − 1 between two documents shares at least one selected
 * fingerprint — local, position-robust detection that whole-document
 * hashing and word-shingle MinHash both miss for code-shaped corpora
 * (renamed identifiers leave long verbatim runs; copied functions
 * move around files).
 *
 * Hashing is an EXPLICIT polynomial rolling hash over CODEPOINTS
 * (base 257, modulus 1e9+7 — both fit int64 arithmetic without
 * overflow: (mod−1)·base + cp < 2⁶³), chosen engine-re-derivable:
 * the oracle re-computes every k-gram hash and every window minimum
 * in SQL from the same constants. Codepoint iteration (not UTF-16
 * chars) keeps supplementary-plane text consistent with SQL engines'
 * character semantics.
 *
 * Returns array<struct<pos int, hash long>> of the selected
 * fingerprints, `pos` the 0-based codepoint offset of the k-gram.
 * Texts shorter than k codepoints → empty array; NULL → NULL. Pure
 * per-row projection, one tight codegen'd loop, O(n) time, O(w)
 * extra space (ring buffer).
 */
case class WinnowExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1, s"k must be >= 1: $k")
  require(w >= 1, s"w must be >= 1: $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false)
  )), containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpr.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowExpr.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  /** Rolling-hash constants — small enough that (Mod−1)·Base + cp
    * stays far inside int64; public textbook Rabin–Karp choice. */
  val Base: Long = 257L
  val Mod: Long = 1000000007L

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    // codepoints once (UTF8String has no random codepoint access)
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val m = n - k + 1 // number of k-grams
    if (m <= 0) return new GenericArrayData(Array.empty[Any])

    // rolling k-gram hashes
    val hashes = new Array[Long](m)
    var pow = 1L // Base^(k-1) mod Mod
    var j = 1
    while (j < k) { pow = pow * Base % Mod; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * pow % Mod + Mod * Mod) % Mod * Base + cps(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }

    // per window of w hashes: minimum, rightmost on ties; distinct
    // consecutive selections (the standard winnowing rule). A window
    // shorter than w (m < w) degenerates to one window over all.
    // Monotonic deque over a ring buffer of indices: the front is
    // always the window's rightmost minimum — pushing index p pops
    // every back entry with hash >= hashes(p) (popping EQUAL hashes is
    // what makes the surviving front the RIGHTMOST of a tie), and the
    // front expires once it leaves the window. Each index enters and
    // leaves the deque at most once → O(m) total, O(w) extra space.
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val ring = new Array[Int](w + 1)
    var head = 0 // ring slot of the deque front
    var len = 0  // live entries
    var lastPos = -1
    var p = 0
    while (p < m) {
      while (len > 0 && hashes(ring((head + len - 1) % (w + 1))) >= hashes(p))
        len -= 1
      ring((head + len) % (w + 1)) = p
      len += 1
      val winStart = p - w + 1 // window [winStart, p] once p >= w-1
      if (ring(head) < winStart) { head = (head + 1) % (w + 1); len -= 1 }
      if (p >= w - 1) {
        val best = ring(head)
        if (best != lastPos) {
          out += new GenericInternalRow(Array[Any](best, hashes(best)))
          lastPos = best
        }
      }
      p += 1
    }
    if (m < w) { // degenerate single window over all m hashes
      val best = ring(head)
      out += new GenericInternalRow(Array[Any](best, hashes(best)))
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowExpr(GraftSqlBridge.expression(c), k, w))
}
