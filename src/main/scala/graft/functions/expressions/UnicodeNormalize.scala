package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD) of
 * a string column — the canonical first step of text-corpus cleaning
 * (web-crawled text mixes composed and decomposed accents; exact and
 * shingle dedup both treat "café" ≠ "cafe"+U+0301 unless normalized).
 *
 * Spark ships no normalizer built-in, so this wraps `java.text.Normalizer`
 * as an expression rather than a Scala UDF: `doGenCode` emits a static
 * call, keeping the projection inside whole-stage codegen with no
 * encoder/serialization seam. The hot path matters at corpus scale:
 * `Normalizer.isNormalized` is checked first — for already-normalized text
 * (virtually all of a real corpus: ASCII is always NFC) that is a
 * read-only scan with ZERO allocation beyond the UTF8String→String decode,
 * and the input object is returned as-is.
 *
 * The NFC form is oracle-checked against DuckDB's `nfc_normalize`
 * (utf8proc) in q85 — both implement the same Unicode normalization spec.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize: form must be one of ${UnicodeNormalize.forms.keys.mkString(", ")}, got '$form'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.expressions.UnicodeNormalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[expressions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Column-API entry point. `form`: NFC (default for cleaning) | NFD |
    * NFKC | NFKD. */
  def apply(text: Column, form: String = "NFC"): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(text), form))

  /** Static so generated code calls it directly. Already-normalized input
    * (the overwhelming common case) returns the SAME UTF8String — no copy. */
  def compute(input: UTF8String, form: String): UTF8String = {
    val f = forms.getOrElse(form,
      throw new IllegalArgumentException(s"unknown normalization form '$form'"))
    val s = input.toString
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }
}
