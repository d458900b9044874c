package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, CACM 18) —
 * the scale-correct tool for LARGE phrase blocklists (banned phrases,
 * PII keyword families, contamination markers): a single O(text) scan
 * matches ALL of N patterns simultaneously, where the regex-alternation
 * spelling (`p1|p2|…`) Java-compiles into a pattern whose cost grows
 * with N and collapses entirely past a few thousand alternatives.
 *
 * The automaton builds once on the DRIVER from the pattern list
 * (nodes ≤ total pattern chars — metadata at any realistic blocklist
 * size) and BROADCASTS; matching is a goto/fail walk per character.
 * `caseInsensitive` lowercases both the patterns (at build) and the
 * text (per row, via JVM lowercase — locale-stable ROOT).
 */
final class AcAutomaton(
  patterns: IndexedSeq[String],
  val caseInsensitive: Boolean
) extends Serializable {
  require(patterns.nonEmpty, "Aho-Corasick needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern in the list")

  val norm: IndexedSeq[String] =
    if (caseInsensitive) patterns.map(_.toLowerCase(java.util.Locale.ROOT))
    else patterns
  // duplicates after normalization would double-report the same phrase
  // (and silently alias ids) — a blocklist bug worth failing on
  require(norm.distinct.size == norm.size,
    s"duplicate pattern(s) after ${if (caseInsensitive) "case folding" else "exact"} " +
      s"normalization: ${norm.diff(norm.distinct).distinct.take(5).mkString(", ")}")

  // goto as per-node char->node maps, fail links, and per-node matched
  // pattern indexes (merged along fail links at build, so matching
  // never chases fail chains for output). The mutable build scaffolding
  // is LOCAL to this block — only the three compact arrays become
  // instance state, so the broadcast ships exactly what matching reads.
  private val (childArr, fail, out): (Array[Map[Char, Int]], Array[Int], Array[Array[Int]]) = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val failB = scala.collection.mutable.ArrayBuffer(0)
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    norm.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          failB += 0
          outB += Nil
          children.size - 1
        })
      }
      outB(node) = pi :: outB(node)
    }
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { c => failB(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = failB(u)
        while (f != 0 && !children(f).contains(ch)) f = failB(f)
        failB(v) = if (children(f).contains(ch) && children(f)(ch) != v)
          children(f)(ch) else 0
        outB(v) = outB(v) ++ outB(failB(v))
        queue += v
      }
    }
    (children.map(_.toMap).toArray, failB.toArray,
      outB.map(_.toArray.sorted).toArray)
  }

  /** Distinct matched pattern indexes, ascending. */
  def matchIds(text: String): Array[Int] = {
    val t = if (caseInsensitive) text.toLowerCase(java.util.Locale.ROOT) else text
    val seen = new java.util.BitSet(norm.size)
    var node = 0
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      while (node != 0 && !childArr(node).contains(ch)) node = fail(node)
      node = childArr(node).getOrElse(ch, 0)
      val o = out(node)
      var j = 0
      while (j < o.length) { seen.set(o(j)); j += 1 }
      i += 1
    }
    val res = scala.collection.mutable.ArrayBuilder.make[Int]
    var b = seen.nextSetBit(0)
    while (b >= 0) { res += b; b = seen.nextSetBit(b + 1) }
    res.result()
  }
}

/** array<int> of distinct matched pattern indexes (ascending) for a
  * text column under a broadcast [[AcAutomaton]]; NULL text → NULL. */
case class AcMatchExpr(child: Expression, automaton: Broadcast[AcAutomaton])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ac_match"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      automaton.value.matchIds(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatchExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.AcMatchExpr) $ref).nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMatchExpr =
    copy(child = newChild)
}

object AcMatchExpr {
  def apply(text: Column, automaton: Broadcast[AcAutomaton]): Column =
    GraftSqlBridge.column(
      AcMatchExpr(GraftSqlBridge.expression(text), automaton))
}
