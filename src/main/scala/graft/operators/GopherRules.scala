package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.TransformConfig
import graft.functions.TextFunctions

/**
 * Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
 * Models: Methods, Analysis & Insights from Training Gopher", §A1.1 — the
 * published heuristic filter suite most open LLM corpora start from).
 * Every rule is a pure per-row Column composition over the same
 * whitespace tokenization as [[graft.functions.TextFunctions.tokens]]:
 * one projection, zero shuffle, whole-stage codegen — rule-checking
 * 100 TB costs exactly one scan, and composes with `filter` exactly like
 * `text_signals`.
 *
 * Rules, in evaluation order (the reported failure is the FIRST hit):
 *   empty            null or whitespace-only text
 *   word_count       tokens outside [minWords, maxWords]
 *   mean_word_length outside [minMeanWordLength, maxMeanWordLength]
 *   symbol_ratio     (# of `#` marks and `...`/`…` ellipses) / words above max
 *   bullet_lines     fraction of lines starting with -, * or • above max
 *   ellipsis_lines   fraction of lines ending with `...`/`…` above max
 *   alpha_words      fraction of tokens containing a letter below min
 *   stopwords        fewer DISTINCT hits than minStopwords from the fixed
 *                    Gopher set {the, be, to, of, and, that, have, with}
 *   top_ngram        top n-gram character fraction above max (OPT-IN —
 *                    the default threshold 1.0 can never fire; Gopher
 *                    arms it at n ∈ {2,3,4} with 0.20/0.18/0.16)
 *   dup_lines        duplicate line fraction above max (OPT-IN; Gopher
 *                    arms it at 0.30)
 *   dup_line_chars   duplicate line character fraction above max
 *                    (OPT-IN; Gopher arms it at 0.20)
 */
object GopherRules {

  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  final case class Thresholds(
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLength: Double = 3.0, maxMeanWordLength: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFraction: Double = 0.9,
      maxEllipsisFraction: Double = 0.3, minAlphaFraction: Double = 0.8,
      minStopwords: Int = 2,
      // top_ngrams is OPT-IN (the fraction caps at 1.0, so the 1.0
      // default can never fire): Gopher applies it at n ∈ {2,3,4} with
      // 0.20/0.18/0.16 — set maxTopNgramFraction (+ topNgramSize) to arm
      maxTopNgramFraction: Double = 1.0, topNgramSize: Int = 2,
      // dup-line gates are OPT-IN too (a first occurrence is never a
      // duplicate, so the fractions are strictly < 1 and the 1.0
      // defaults can never fire); Gopher arms them at 0.30 / 0.20
      maxDupLineFraction: Double = 1.0, maxDupLineCharFraction: Double = 1.0)

  /** Stage the two single-pass signal structs
    * ([[graft.functions.expressions.TokenSignals]] /
    * [[graft.functions.expressions.LineSignals]]) as real columns, derive
    * the first-failing-rule chain from them in a SECOND projection, then
    * drop the staging columns. The staging matters: the fail chain
    * references each signal in several `when` branches, and conditional
    * branches are exempt from codegen subexpression elimination — inlined,
    * the token walk re-ran per reference (measured SLOWER than the
    * interpreted-HOF form it replaced). CollapseProject keeps non-cheap
    * multiply-referenced aliases staged, so each walk runs once per row.
    * The composable filter-lambda forms (a regex per token/line,
    * interpreted) remain in GopherRulesSpec as the parity reference. */
  private def withFail(df: DataFrame, textCol: String, th: Thresholds,
                       failCol: String): DataFrame = {
    // staged helper names are fixed — a same-named input column would be
    // silently overwritten then dropped (the repo-standard guard)
    graft.config.ExprUtils.requireNoHelperCollision("quality_rules",
      df.columns, "__gopher_ts", "__gopher_ls", "__gopher_fail0")
    val text = col(textCol)
    val staged = df
      .withColumn("__gopher_ts", graft.functions.expressions.TokenSignals(
        TextFunctions.tokens(text), Nil, gopherStopwords, Nil,
        withFingerprint = false))
      .withColumn("__gopher_ls",
        graft.functions.expressions.LineSignals(split(text, "\n")))
    val ts = col("__gopher_ts"); val ls = col("__gopher_ls")
    val nToks = ts.getField("n")
    val nWords = when(length(trim(text)) === 0, 0).otherwise(nToks)
    val meanLen = when(nToks === 0, 0.0).otherwise(
      ts.getField("sum_len").cast("double") / nToks)
    val symbolRatio = when(nWords === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("#|\\.\\.\\.|…")).cast("double") / nWords)
    val nLines = ls.getField("n")
    val bulletFrac = when(nLines === 0, lit(0.0)).otherwise(
      ls.getField("bullets").cast("double") / nLines)
    val ellipsisFrac = when(nLines === 0, lit(0.0)).otherwise(
      ls.getField("ellipsis").cast("double") / nLines)
    val alphaFrac = when(nWords === 0, lit(0.0)).otherwise(
      ts.getField("alpha").cast("double") / nWords)
    val stopHits = ts.getField("distinct_stop_hits")

    val base = when(text.isNull || length(trim(text)) === 0, "empty")
      .when(nWords < th.minWords || nWords > th.maxWords, "word_count")
      .when(meanLen < th.minMeanWordLength || meanLen > th.maxMeanWordLength,
        "mean_word_length")
      .when(symbolRatio > th.maxSymbolRatio, "symbol_ratio")
      .when(bulletFrac > th.maxBulletFraction, "bullet_lines")
      .when(ellipsisFrac > th.maxEllipsisFraction, "ellipsis_lines")
      .when(alphaFrac < th.minAlphaFraction, "alpha_words")
      .when(stopHits < th.minStopwords, "stopwords")
    // repetition branches only exist when ARMED: their fractions cannot
    // exceed (top_ngram) or reach (dup_line*) the 1.0 defaults, and an
    // always-false branch would still make every unarmed run pay the
    // per-row n-gram/line walks
    val armed1 = if (th.maxTopNgramFraction < 1.0)
        base.when(TextFunctions.topNgramFraction(text, th.topNgramSize)
          > th.maxTopNgramFraction, "top_ngram")
      else base
    val armed2 = if (th.maxDupLineFraction < 1.0)
        armed1.when(TextFunctions.dupLineFraction(text)
          > th.maxDupLineFraction, "dup_lines")
      else armed1
    val armed3 = if (th.maxDupLineCharFraction < 1.0)
        armed2.when(TextFunctions.dupLineCharFraction(text)
          > th.maxDupLineCharFraction, "dup_line_chars")
      else armed2
    val fail = armed3.otherwise(lit(null).cast("string"))
    staged.withColumn(failCol, fail).drop("__gopher_ts", "__gopher_ls")
  }

  /** Annotate: append `gopher_keep` + `gopher_fail` (first failing rule). */
  def annotate(df: DataFrame, textCol: String,
               th: Thresholds = Thresholds()): DataFrame =
    withFail(df, textCol, th, "__gopher_fail0")
      .withColumn("gopher_keep", col("__gopher_fail0").isNull)
      .withColumn("gopher_fail", col("__gopher_fail0"))
      .drop("__gopher_fail0")

  /** Filter: keep only rows passing every rule. */
  def applyFilter(df: DataFrame, textCol: String,
                  th: Thresholds = Thresholds()): DataFrame =
    withFail(df, textCol, th, "__gopher_fail0")
      .where(col("__gopher_fail0").isNull).drop("__gopher_fail0")
}

/**
 * quality_rules — declarative Gopher-rule quality gate.
 *
 * {{{
 * - name: gate
 *   type: quality_rules
 *   options: {textColumn: text, mode: filter, minWords: "50"}
 * }}}
 *
 * `mode: annotate (default) | filter`; every threshold overridable:
 * minWords/maxWords, minMeanWordLength/maxMeanWordLength, maxSymbolRatio,
 * maxBulletFraction, maxEllipsisFraction, minAlphaFraction, minStopwords,
 * maxTopNgramFraction (+ topNgramSize), maxDupLineFraction,
 * maxDupLineCharFraction (the opt-in repetition rules).
 */
object GopherRulesTransform extends Transform {
  val transformType = "quality_rules"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema, config.options.get("textColumn").toSeq, "quality_rules")

  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "textColumn")
    val o = config.options
    def d(key: String, default: Double): Double =
      try o.get(key).map(_.toDouble).getOrElse(default)
      catch { case _: NumberFormatException =>
        throw new ConfigException(s"quality_rules: $key must be numeric, got '${o(key)}'") }
    // integral thresholds must not silently truncate ("50.9" gating at 50)
    def i(key: String, default: Long): Long =
      o.get(key).map { v =>
        try v.toLong catch { case _: NumberFormatException =>
          throw new ConfigException(
            s"quality_rules: $key must be an integer, got '$v'") }
      }.getOrElse(default)
    val th = GopherRules.Thresholds(
      minWords = i("minWords", 50), maxWords = i("maxWords", 100000),
      minMeanWordLength = d("minMeanWordLength", 3.0),
      maxMeanWordLength = d("maxMeanWordLength", 10.0),
      maxSymbolRatio = d("maxSymbolRatio", 0.1),
      maxBulletFraction = d("maxBulletFraction", 0.9),
      maxEllipsisFraction = d("maxEllipsisFraction", 0.3),
      minAlphaFraction = d("minAlphaFraction", 0.8),
      minStopwords = i("minStopwords", 2).toInt,
      maxTopNgramFraction = d("maxTopNgramFraction", 1.0),
      topNgramSize = i("topNgramSize", 2).toInt,
      maxDupLineFraction = d("maxDupLineFraction", 1.0),
      maxDupLineCharFraction = d("maxDupLineCharFraction", 1.0))
    val textCol = o("textColumn")
    o.getOrElse("mode", "annotate") match {
      case "annotate" => GopherRules.annotate(input, textCol, th)
      case "filter"   => GopherRules.applyFilter(input, textCol, th)
      case other => throw new ConfigException(
        s"quality_rules mode must be annotate|filter, got '$other'")
    }
  }
}
