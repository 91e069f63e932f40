package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: WITHIN-document line deduplication — keep
 * the first occurrence of every participating line inside one document,
 * in one pass (Gopher-style repetition REMOVAL, where `dup_line_fraction`
 * only scores it). The cross-document variant is a corpus-wide
 * aggregation ([[graft.dedup.LineDedup]]); this one is pure per-row
 * compute, so it stays a zero-shuffle codegen'd projection — no explode,
 * no line-keyed exchange at all.
 *
 * Lines shorter than `minLength` characters (code points, matching
 * `length()` on both engines) never participate: every occurrence is
 * kept verbatim, preserving blank-line document structure. Null text
 * stays null.
 */
case class DedupLinesInDoc(child: Expression, separator: String, minLength: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if separator.nonEmpty && minLength >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines_in_doc: separator must be non-empty and minLength >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines_in_doc expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DedupLinesInDoc.compute(input.asInstanceOf[UTF8String],
      UTF8String.fromString(separator), minLength)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the separator is arbitrary user text — ship it as a referenced
    // object instead of splicing it into generated Java source
    val sepRef = ctx.addReferenceObj("sep", UTF8String.fromString(separator),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.DedupLinesInDoc.compute($c, $sepRef, $minLength)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DedupLinesInDoc {
  def apply(text: Column, separator: String, minLength: Int): Column =
    GraftBridge.column(
      DedupLinesInDoc(GraftBridge.expression(text), separator, minLength))

  /** Static so generated code calls it directly. */
  def compute(input: UTF8String, sep: UTF8String, minLength: Int): UTF8String = {
    val text = input.toString
    val s = sep.toString
    // literal-substring walk instead of split(Pattern.quote(s), -1): the
    // regex form compiles a fresh Pattern PER ROW; the walk splits on the
    // same non-overlapping left-to-right literal occurrences and keeps
    // trailing empties exactly like the -1 limit
    val parts: Array[String] =
      if (s.isEmpty) text.split(java.util.regex.Pattern.quote(s), -1)
      else {
        val b = Array.newBuilder[String]
        var from = 0
        var i = text.indexOf(s, from)
        while (i >= 0) {
          b += text.substring(from, i)
          from = i + s.length
          i = text.indexOf(s, from)
        }
        b += text.substring(from)
        b.result()
      }
    val seen = new java.util.HashSet[String]()
    val out = new java.lang.StringBuilder(text.length)
    var wrote = false
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      val participates = p.codePointCount(0, p.length) >= minLength
      if (!participates || seen.add(p)) {
        if (wrote) out.append(s)
        out.append(p)
        wrote = true
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}
