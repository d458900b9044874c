package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization (java.text.Normalizer) as a native codegen'd
 * expression — the missing preprocessing step for multilingual dedup:
 * "Café" composed (U+00E9) and decomposed (e + U+0301) are DIFFERENT
 * byte sequences, so every hash-keyed operator in this engine (exact
 * dedup fingerprints, line-rule hashes, shingle/MinHash chains,
 * contamination grams) treats visually identical text as distinct
 * until it is normalized. Run NFC before hashing multilingual corpora;
 * NFKC additionally folds compatibility forms (ligatures, full-width
 * Latin) when aggressive canonicalization is wanted.
 *
 * Spark has no built-in for this (lower/trim/regexp are byte-level);
 * the expression is a single static `Normalizer.normalize` call in
 * both interpreted and generated code — a scan-projection citizen like
 * the rest of the text family, no UDF, no shuffle. The NFC form is
 * oracle-portable (DuckDB `nfc_normalize`); other forms are
 * spec-pinned against java.text.Normalizer directly.
 */
case class UnicodeNormExpr(child: Expression, form: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (!UnicodeNormExpr.Forms.contains(form))
      // a bad form name fails at ANALYSIS time, not on executors
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormExpr.Forms.mkString(", ")}: got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString,
        java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

object UnicodeNormExpr {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def apply(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.column(UnicodeNormExpr(GraftSqlBridge.expression(c), form))
}
