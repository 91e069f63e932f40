package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native single-pass Gopher "top n-gram character fraction" (see
 * [[graft.functions.TextFunctions.topNgramFraction]] for the published
 * contract this implements bit-for-bit — same tokenization, election,
 * cap, rounding; the q141 oracle pins it against DuckDB).
 *
 * Why a custom Expression (the [[TokenSignals]] case, re-measured here):
 * the Column spelling of this measure is an `array_max(transform(
 * item_counts(word_ngrams(...))))` chain referenced from several `when`/
 * `getField` branches — higher-order functions evaluate INTERPRETED, and
 * conditional branches are exempt from subexpression elimination, so the
 * whole n-gram walk re-ran per reference: measured 7.8 s for 5000
 * ~50-token docs at sf0.1. This walk runs once per row inside codegen:
 * measured ~0.2 s on the same corpus, a ~40× cut for the hot signal a
 * repetition gate applies to EVERY document.
 */
case class TopNgramFraction(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"top_ngram_fraction: n must be >= 1, got $n")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_ngram_fraction expects a string column, got ${other.simpleString}")
  }

  def compute(input: UTF8String): Double = {
    // EXACTLY TextFunctions.tokens: trim the engine ws set, lower
    // (UTF8String's locale-independent mapping, what Spark's lower()
    // does), split on \s+
    val stripped = stripWs(input.toString)
    if (stripped.isEmpty) return 0.0
    val toks = TopNgramFraction.wsSplit.split(
      UTF8String.fromString(stripped).toLowerCase.toString)
    if (toks.length < n) return 0.0
    var sumLens = 0L
    // CODE POINTS, not UTF-16 units — Spark's length() counts chars
    toks.foreach(t => sumLens += t.codePointCount(0, t.length))
    val denom = math.max(sumLens + (toks.length - 1), 1L).toDouble
    // wordNgrams: <= n tokens → ONE gram of the whole text; else sliding
    var bestC = 0L; var bestL = 0L
    if (toks.length == n) { bestC = 1L; bestL = sumLens + (n - 1) }
    else {
      val counts = new java.util.HashMap[String, Long]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val c = e.getValue; val l = k.codePointCount(0, k.length).toLong
        // elect by (count, char length); further ties carry the same
        // length, so they cannot change the fraction
        if (c > bestC || (c == bestC && l > bestL)) { bestC = c; bestL = l }
      }
    }
    val frac = math.min(1.0, bestC * bestL / denom)
    // Spark round() semantics for doubles: the SHORTEST-decimal
    // representation (BigDecimal.valueOf), then HALF_UP at 4 decimals —
    // new BigDecimal(double) would round the exact binary expansion,
    // which can differ at a boundary
    java.math.BigDecimal.valueOf(frac)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def stripWs(s: String): String = {
    var i = 0; var j = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'
    while (i < j && ws(s.charAt(i))) i += 1
    while (j > i && ws(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topNgram", this, classOf[TopNgramFraction].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramFraction {
  // hoisted: String.split("\\s+") re-compiles the Pattern per row
  private[expressions] val wsSplit = java.util.regex.Pattern.compile("\\s+")

  def apply(text: Column, n: Int): Column =
    GraftBridge.column(TopNgramFraction(GraftBridge.expression(text), n))
}
