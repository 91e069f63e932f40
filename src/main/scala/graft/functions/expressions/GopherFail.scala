package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher-rule first-failing-rule chain FUSED into one deterministic
 * expression: returns the name of the first rule the document fails, or
 * NULL when every rule passes (`quality_rules`' `gopher_fail`).
 *
 * Why one expression instead of the staged-columns + `when`-chain form it
 * replaces (optimization-guide §4.4, round-17 verdict item #1): the chain
 * references each signal struct in several branches, and
 *  - `PushPredicateThroughNonJoin` substitutes staged aliases into a
 *    pushed filter predicate with no cost check (measured: 14 TokenSignals
 *    evaluations in the pushed quality_rules-filter plan, 3.3× the
 *    annotate cost), and
 *  - conditional branches are exempt from codegen subexpression
 *    elimination, so inlined references re-run the walks per row.
 * Round 17 pinned the staged columns with a non-deterministic wrapper
 * (`EvalOnce`), which fixed the duplication but made the staging Project
 * a pushdown barrier for EVERY later predicate — at 100 TB a lost
 * scan-level prune is a full-corpus read. Fusing the chain removes both
 * problems at once: each expensive child (token walk, line walk, symbol
 * regex, optional BPE encode / n-gram / dup-line walks) is a child
 * expression evaluated AT MOST ONCE per row inside this node, the chain
 * short-circuits in rule order (a doc failing `word_count` never pays the
 * BPE encode), and the expression is honestly deterministic, so the
 * optimizer remains free to push it down — and to push every OTHER
 * predicate past it to the scan.
 *
 * Semantics are bit-identical to the `when`-chain reference kept in
 * GopherRulesSpec: rule order, 0-denominator cases, and three-valued
 * logic (a NULL signal skips its rules) are reproduced exactly.
 *
 * Children, in evaluation order (optional gates present only when armed,
 * so an unarmed run never constructs — let alone evaluates — the walk):
 *   empty        `text IS NULL OR length(trim(text)) = 0` (never null)
 *   ts           [[TokenSignals]] struct (n, sum_len, _, alpha, distinct_stop_hits, ...)
 *   sym          `regexp_count(text, '#|\\.\\.\\.|…')`
 *   ls           [[LineSignals]] struct (n, bullets, ellipsis)
 *   bpe          optional tokenizer-exact token count (long, non-null)
 *   topNgram     optional top n-gram character fraction (double)
 *   dupLine      optional duplicate-line fraction (double)
 *   dupLineChar  optional duplicate-line-char fraction (double)
 */
case class GopherFail(
    empty: Expression, ts: Expression, sym: Expression, ls: Expression,
    bpe: Option[Expression], topNgram: Option[Expression],
    dupLine: Option[Expression], dupLineChar: Option[Expression],
    minWords: Long, maxWords: Long,
    minMeanWordLength: Double, maxMeanWordLength: Double,
    maxSymbolRatio: Double, maxBulletFraction: Double,
    maxEllipsisFraction: Double, minAlphaFraction: Double,
    minStopwords: Int, minBpeTokens: Long, maxBpeTokens: Long,
    maxTopNgramFraction: Double, maxDupLineFraction: Double,
    maxDupLineCharFraction: Double) extends Expression {

  override def children: Seq[Expression] =
    Seq(empty, ts, sym, ls) ++ bpe ++ topNgram ++ dupLine ++ dupLineChar

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gopher_fail"

  import GopherFail.Rules

  override def eval(input: InternalRow): Any = {
    val e = empty.eval(input)
    if (e != null && e.asInstanceOf[Boolean]) return Rules(11)  // "empty"
    val tsv = ts.eval(input).asInstanceOf[InternalRow]
    if (tsv != null) {
      val nToks = tsv.getInt(0)
      val nWords = nToks.toLong  // empty=false ⇒ trim non-empty ⇒ nWords = n
      if (nWords < minWords || nWords > maxWords) return Rules(0)
      val meanLen = if (nToks == 0) 0.0 else tsv.getLong(1).toDouble / nToks
      if (meanLen < minMeanWordLength || meanLen > maxMeanWordLength)
        return Rules(1)
      if (nWords == 0L) {
        if (0.0 > maxSymbolRatio) return Rules(2)
      } else {
        val sv = sym.eval(input)
        if (sv != null &&
            sv.asInstanceOf[Number].doubleValue() / nWords > maxSymbolRatio)
          return Rules(2)
      }
    }
    // line rules run even when the token struct is null (when-chain parity:
    // each rule's condition is independently three-valued)
    val lsv = ls.eval(input).asInstanceOf[InternalRow]
    if (lsv != null) {
      val nLines = lsv.getInt(0)
      val bulletFrac = if (nLines == 0) 0.0 else lsv.getInt(1).toDouble / nLines
      if (bulletFrac > maxBulletFraction) return Rules(3)
      val ellipsisFrac = if (nLines == 0) 0.0 else lsv.getInt(2).toDouble / nLines
      if (ellipsisFrac > maxEllipsisFraction) return Rules(4)
    }
    if (tsv != null) {
      val nToks = tsv.getInt(0)
      val alphaFrac = if (nToks == 0) 0.0 else tsv.getInt(3).toDouble / nToks
      if (alphaFrac < minAlphaFraction) return Rules(5)
      if (tsv.getInt(4) < minStopwords) return Rules(6)
    }
    bpe match {
      case Some(b) =>
        val v = b.eval(input)
        if (v != null) {
          val n = v.asInstanceOf[Number].longValue()
          if (n < minBpeTokens || n > maxBpeTokens) return Rules(7)
        }
      case None =>
    }
    topNgram match {
      case Some(t) =>
        val v = t.eval(input)
        if (v != null && v.asInstanceOf[Double] > maxTopNgramFraction)
          return Rules(8)
      case None =>
    }
    dupLine match {
      case Some(d) =>
        val v = d.eval(input)
        if (v != null && v.asInstanceOf[Double] > maxDupLineFraction)
          return Rules(9)
      case None =>
    }
    dupLineChar match {
      case Some(d) =>
        val v = d.eval(input)
        if (v != null && v.asInstanceOf[Double] > maxDupLineCharFraction)
          return Rules(10)
      case None =>
    }
    null
  }

  private def dlit(v: Double): String =
    if (v.isNaN) "Double.NaN"
    else if (v == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
    else if (v == Double.NegativeInfinity) "Double.NEGATIVE_INFINITY"
    else s"${v}D"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val names = ctx.addReferenceObj("gopherRuleNames", Rules,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val emptyC = empty.genCode(ctx)
    val tsC = ts.genCode(ctx)
    val symC = sym.genCode(ctx)
    val lsC = ls.genCode(ctx)
    val rule = ctx.freshName("rule")
    val tsOk = ctx.freshName("tsOk")
    val nToks = ctx.freshName("nToks")
    val sumLen = ctx.freshName("sumLen")
    val alphaCnt = ctx.freshName("alphaCnt")
    val stopHits = ctx.freshName("stopHits")
    val tsr = ctx.freshName("tsr")
    val lsr = ctx.freshName("lsr")
    val nL = ctx.freshName("nLines")
    val v = ctx.freshName("v")

    def optGate(optC: Option[ExprCode], cond: String => String, idx: Int): String =
      optC match {
        case Some(c) =>
          s"""
          if ($rule < 0) {
            ${c.code}
            if (!${c.isNull} && (${cond(c.value.toString)})) { $rule = $idx; }
          }"""
        case None => ""
      }
    val bpeC = bpe.map(_.genCode(ctx))
    val tnC = topNgram.map(_.genCode(ctx))
    val dlC = dupLine.map(_.genCode(ctx))
    val dlcC = dupLineChar.map(_.genCode(ctx))

    val code =
      code"""
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      ${emptyC.code}
      if (!${emptyC.isNull} && ${emptyC.value}) {
        ${ev.isNull} = false; ${ev.value} = $names[11];
      } else {
        int $rule = -1;
        ${tsC.code}
        boolean $tsOk = !${tsC.isNull};
        int $nToks = 0; long $sumLen = 0L; int $alphaCnt = 0; int $stopHits = 0;
        if ($tsOk) {
          InternalRow $tsr = ${tsC.value};
          $nToks = $tsr.getInt(0); $sumLen = $tsr.getLong(1);
          $alphaCnt = $tsr.getInt(3); $stopHits = $tsr.getInt(4);
        }
        if ($tsOk) {
          if ((long) $nToks < ${minWords}L || (long) $nToks > ${maxWords}L) {
            $rule = 0;
          }
          if ($rule < 0) {
            double $v = $nToks == 0 ? 0.0D : (double) $sumLen / $nToks;
            if ($v < ${dlit(minMeanWordLength)} || $v > ${dlit(maxMeanWordLength)}) { $rule = 1; }
          }
          if ($rule < 0) {
            if ($nToks == 0) {
              if (0.0D > ${dlit(maxSymbolRatio)}) { $rule = 2; }
            } else {
              ${symC.code}
              if (!${symC.isNull}) {
                double $v = (double) ${symC.value} / $nToks;
                if ($v > ${dlit(maxSymbolRatio)}) { $rule = 2; }
              }
            }
          }
        }
        if ($rule < 0) {
          ${lsC.code}
          if (!${lsC.isNull}) {
            InternalRow $lsr = ${lsC.value};
            int $nL = $lsr.getInt(0);
            double $v = $nL == 0 ? 0.0D : (double) $lsr.getInt(1) / $nL;
            if ($v > ${dlit(maxBulletFraction)}) { $rule = 3; }
            else {
              double ${v}e = $nL == 0 ? 0.0D : (double) $lsr.getInt(2) / $nL;
              if (${v}e > ${dlit(maxEllipsisFraction)}) { $rule = 4; }
            }
          }
        }
        if ($rule < 0 && $tsOk) {
          double $v = $nToks == 0 ? 0.0D : (double) $alphaCnt / $nToks;
          if ($v < ${dlit(minAlphaFraction)}) { $rule = 5; }
          else if ($stopHits < $minStopwords) { $rule = 6; }
        }
        ${optGate(bpeC, bv => s"(long) $bv < ${minBpeTokens}L || (long) $bv > ${maxBpeTokens}L", 7)}
        ${optGate(tnC, tv => s"$tv > ${dlit(maxTopNgramFraction)}", 8)}
        ${optGate(dlC, dv => s"$dv > ${dlit(maxDupLineFraction)}", 9)}
        ${optGate(dlcC, dv => s"$dv > ${dlit(maxDupLineCharFraction)}", 10)}
        if ($rule >= 0) { ${ev.isNull} = false; ${ev.value} = $names[$rule]; }
      }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = {
    var i = 4
    def next(opt: Option[Expression]): Option[Expression] =
      if (opt.isDefined) { val e = newChildren(i); i += 1; Some(e) } else None
    copy(empty = newChildren(0), ts = newChildren(1), sym = newChildren(2),
      ls = newChildren(3), bpe = next(bpe), topNgram = next(topNgram),
      dupLine = next(dupLine), dupLineChar = next(dupLineChar))
  }
}

object GopherFail {
  /** Rule names in chain order; index 11 is the leading `empty` rule. */
  private[expressions] val Rules: Array[UTF8String] = Array(
    "word_count", "mean_word_length", "symbol_ratio", "bullet_lines",
    "ellipsis_lines", "alpha_words", "stopwords", "bpe_token_count",
    "top_ngram", "dup_lines", "dup_line_chars", "empty")
    .map(UTF8String.fromString)

  // scalastyle:off parameter.number
  def column(empty: Column, ts: Column, sym: Column, ls: Column,
             bpe: Option[Column], topNgram: Option[Column],
             dupLine: Option[Column], dupLineChar: Option[Column],
             minWords: Long, maxWords: Long,
             minMeanWordLength: Double, maxMeanWordLength: Double,
             maxSymbolRatio: Double, maxBulletFraction: Double,
             maxEllipsisFraction: Double, minAlphaFraction: Double,
             minStopwords: Int, minBpeTokens: Long, maxBpeTokens: Long,
             maxTopNgramFraction: Double, maxDupLineFraction: Double,
             maxDupLineCharFraction: Double): Column =
    GraftBridge.column(GopherFail(
      GraftBridge.expression(empty), GraftBridge.expression(ts),
      GraftBridge.expression(sym), GraftBridge.expression(ls),
      bpe.map(GraftBridge.expression), topNgram.map(GraftBridge.expression),
      dupLine.map(GraftBridge.expression), dupLineChar.map(GraftBridge.expression),
      minWords, maxWords, minMeanWordLength, maxMeanWordLength,
      maxSymbolRatio, maxBulletFraction, maxEllipsisFraction,
      minAlphaFraction, minStopwords, minBpeTokens, maxBpeTokens,
      maxTopNgramFraction, maxDupLineFraction, maxDupLineCharFraction))
  // scalastyle:on parameter.number
}
