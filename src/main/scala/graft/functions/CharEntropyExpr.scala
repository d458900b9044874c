package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Shannon character entropy (bits per character) of a string —
 * one pass over the code points with a primitive count map, then
 * H = (ln n − Σ c·ln c / n) / ln 2. NULL for NULL or empty input (no
 * distribution to measure).
 *
 * Value-parallel to the portable sorted-run fold in
 * [[graft.operators.TextAnalysis.withCharEntropy]]'s oracle (same
 * formula; summation order differs, absorbed by the gate's round-6 —
 * the q_unigram_nll doctrine) but evaluated as ONE call: the HOF fold
 * pays an interpreted array_sort + per-element lambda frame
 * (CodegenFallback), this code-gens to a single static call. Code-point
 * semantics match `string_split_regex(s, '')` / Java zero-width split:
 * surrogate pairs count once.
 */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("ent")
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Double $v = graft.functions.CharEntropyExpr$$.MODULE$$.entropy($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {
  def apply(c: Column): Column =
    GraftSqlBridge.column(CharEntropyExpr(GraftSqlBridge.expression(c)))

  /** null (boxed) for the empty string — mapped to SQL NULL above. */
  def entropy(s: UTF8String): java.lang.Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return null
    // code-point counts; open-addressed via LongMap-like java HashMap is
    // overkill — a small int map suffices (documents rarely exceed a few
    // hundred distinct code points)
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var n = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    var s2 = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      s2 += c * math.log(c)
    }
    val nd = n.toDouble
    java.lang.Double.valueOf((math.log(nd) - s2 / nd) / math.log(2.0))
  }
}
