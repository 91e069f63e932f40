package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Native single-pass WITHIN-document duplicate-line statistics — the
 * remaining Gopher §A1.1 repetition measures (duplicate line fraction and
 * duplicate line CHARACTER fraction; fed a `\n\n` split, the same measures
 * over paragraphs). One walk with a seen-set per row, [[TokenSignals]]'
 * shape: a line is a DUPLICATE when an identical earlier line exists in
 * the same document; lines shorter than `minLength` code points never
 * participate (excluded from counts and totals both — the
 * [[graft.dedup.LineDedup]] convention, so empty lines can't dilute the
 * fraction). Lengths are CODE POINTS (Spark `length()` parity). Null
 * line slots are skipped like [[LineSignals]].
 *
 * Returns struct(n_lines, total_chars, dup_lines, dup_chars); the
 * fraction spellings live in [[graft.functions.TextFunctions]].
 */
case class DupLineStats(child: Expression, minLength: Int)
    extends UnaryExpression {
  require(minLength >= 1, s"dup_line_stats: minLength must be >= 1, got $minLength")

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("dup_lines", IntegerType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_line_stats expects array<string> (the line array), got ${other.simpleString}")
  }

  def compute(input: ArrayData): GenericInternalRow = {
    val n = input.numElements()
    val seen = new java.util.HashSet[String]()
    var nLines = 0; var dupLines = 0
    var totalChars = 0L; var dupChars = 0L
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i).toString
        val chars = s.codePointCount(0, s.length)
        if (chars >= minLength) {
          nLines += 1
          totalChars += chars
          if (!seen.add(s)) { dupLines += 1; dupChars += chars }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nLines, totalChars, dupLines, dupChars))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dupLineStats", this, classOf[DupLineStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupLineStats {
  def apply(lines: Column, minLength: Int = 1): Column =
    GraftBridge.column(DupLineStats(GraftBridge.expression(lines), minLength))
}
