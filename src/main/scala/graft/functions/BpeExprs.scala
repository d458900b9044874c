package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding model: the learned merge list (pair → rank, rank =
 * file order) plus the token → id vocabulary — the public GPT-2-style
 * artifact format (a `merges.txt` of space-separated pairs and a
 * `vocab.json` of token ids; see [[graft.operators.Bpe]] for loaders).
 *
 * Well-formedness is REQUIRED at construction: every multi-character
 * constituent of a merge must be the output of an earlier merge. Real
 * learned files satisfy this by construction (a pair can only be
 * learned between symbols that already exist); a file that violates it
 * is corrupt, and the check is also what licenses the oracle's
 * sequential-replay spelling (apply rules in rank order) as equivalent
 * to the min-rank-first reference algorithm implemented here — with
 * the constituent property, a later rule can never create an occurrence
 * of an earlier one.
 */
final class BpeModel(
  val merges: IndexedSeq[(String, String)],
  val vocab: Map[String, Int]
) extends Serializable {

  {
    val produced = scala.collection.mutable.HashSet.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def ok(t: String): Boolean =
        t.codePointCount(0, t.length) == 1 || produced.contains(t)
      require(ok(a) && ok(b),
        s"merges rank $i ($a, $b): multi-character constituent not produced " +
          "by any earlier merge — the file is corrupt or reordered")
      produced += (a + b)
    }
  }

  /** pair → rank; lower rank merges first. */
  val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** Tokens absent from the vocabulary encode as this id. A well-formed
    * (merges, vocab) pair never hits it; it keeps a vocab/corpus
    * mismatch deterministic instead of throwing per-row. */
  val UnknownId: Int = -1

  /** Encode one pre-token (already whitespace-mapped) to token ids by
    * the reference BPE algorithm: repeatedly merge the lowest-rank
    * adjacent pair (all its occurrences, left to right — occurrences of
    * the minimum-rank pair are disjoint-mergeable because any pair
    * containing the merged symbol has strictly higher rank) until no
    * adjacent pair is mergeable. Symbols start as single code points. */
  def encodeWord(word: String): Array[Int] = {
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms.iterator.map(s => vocab.getOrElse(s, UnknownId)).toArray
  }
}

/**
 * BPE-encode an array of pre-tokens to one flat array of token ids —
 * the evaluation core of [[graft.operators.Bpe]]. The model rides a
 * BROADCAST (one copy per executor, a broadcast stub per task — a 50k-
 * merge GPT-2 model is ~2 MB, which must not re-ship with every task's
 * serialized plan). Whitespace is mapped to the GPT-2 marker characters
 * (' '→Ġ, \n→Ċ, \t→ĉ, \r→č) before encoding, so pre-tokens produced by
 * [[graft.operators.Bpe.PreTokenPattern]] match merges learned over
 * marker-mapped text. Per-task word cache: corpus text repeats words
 * heavily, and BPE is O(len²) per distinct word — the cache makes the
 * common case a hash probe.
 */
case class BpeEncodeExpr(child: Expression, model: Broadcast[BpeModel])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> pre-tokens, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  // cleared (re-created) per deserialized instance — i.e. per task —
  // and bounded: a pathological corpus of unique words cannot grow it
  // past CacheCap entries
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val CacheCap = 65536

  private def mapWhitespace(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == ' ' || c == '\n' || c == '\t' || c == '\r'
      i += 1
    }
    if (!needs) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case ' '  => sb.append('Ġ') // Ġ
          case '\n' => sb.append('Ċ') // Ċ
          case '\t' => sb.append('ĉ') // ĉ
          case '\r' => sb.append('č') // č
          case c    => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = model.value
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val word = mapWhitespace(arr.getUTF8String(i).toString)
        var ids = cache.get(word)
        if (ids == null) {
          ids = m.encodeWord(word)
          if (cache.size < CacheCap) cache.put(word, ids)
        }
        out ++= ids
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeExpr", this)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"((graft.functions.BpeEncodeExpr) $ref).nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def apply(preTokens: Column, model: Broadcast[BpeModel]): Column =
    GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(preTokens), model))
}
