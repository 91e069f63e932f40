package graft.operators

import org.apache.spark.sql.DataFrame

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.TransformConfig
import graft.text.ChargramLm

/**
 * chargram_lm — train the per-label character n-gram language-model
 * STORE from a labeled corpus: one (label, gram) aggregation, stamped
 * with `clm_n`/`clm_min_count`, persisted via an ordinary file sink and
 * consumed by `lang_classify` in later runs (the merges / codebook /
 * signature store family; see [[graft.text.ChargramLm.modelFrame]] for
 * the scale shape and the loud-failure contract).
 *
 * {{{
 * - name: lang-model
 *   type: chargram_lm
 *   options: {labelColumn: lang, textColumn: text, n: "3", minCount: "2"}
 * }}}
 *
 * `minCount` scales with corpus size: at volume a floor of 2+ bounds the
 * store against hapax noise, but on a SMALL corpus it starves the model
 * (most grams occur once) and classification degenerates toward the
 * all-unseen term, where the smallest-total label wins every document —
 * keep 1 for small strata (measured: quickstart-25's 10-doc corpus
 * predicts everything as the sparsest label at minCount=2).
 */
object ChargramLmTransform extends Transform {
  val transformType = "chargram_lm"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      config.options.get("labelColumn").toSeq ++ config.options.get("textColumn").toSeq,
      transformType)
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "labelColumn", "textColumn")
    try ChargramLm.modelFrame(input, config.options("labelColumn"),
      config.options("textColumn"),
      n = config.options.get("n").map(_.toInt).getOrElse(3),
      minCount = config.options.get("minCount").map(_.toLong).getOrElse(1L))
    catch { case e: IllegalArgumentException => throw new ConfigException(e.getMessage) }
  }
}

/**
 * lang_classify — append the TRAINED language prediction from a
 * registered `chargram_lm` store (`modelView`): add-one-smoothed
 * log-likelihood per label, argmax appended as `outputColumn` (default
 * `lang_pred`), optional `scoreColumn` with the rounded best score.
 * ONE zero-shuffle codegen'd projection against the broadcast model
 * object ([[graft.text.ChargramLm.classify]]). `n`/`minCount`, when
 * given, must match the store's training stamps; `maxLabels` (default
 * 1000) bounds the per-row score vector and `maxModelRows` (default
 * 5000000) the one driver collect. Documents with no grams (null /
 * shorter than the store's n) classify as `"und"` — the `langId`
 * convention.
 *
 * {{{
 * - name: lang
 *   type: lang_classify
 *   options: {textColumn: text, modelView: lang_model}
 * }}}
 */
object LangClassifyTransform extends Transform {
  val transformType = "lang_classify"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema, config.options.get("textColumn").toSeq,
      transformType)
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "textColumn", "modelView")
    // scoring is per-row — an id plays no role; accepting one silently
    // would imply join semantics that don't exist (set-but-unused options
    // are config contradictions, the text_signals/mergesView discipline)
    if (config.options.contains("idColumn")) throw new ConfigException(
      s"$transformType: idColumn is not an option — classification is a " +
        "per-row projection and needs no id; drop the option")
    val store = Stores.fromView(ctx, config.options("modelView"),
      "modelView", transformType, "chargram_lm")
    val loaded = ChargramLm.load(store,
      wantN = config.options.get("n").map(_.toInt),
      wantMinCount = config.options.get("minCount").map(_.toLong),
      maxLabels = config.options.get("maxLabels").map(_.toInt).getOrElse(1000),
      maxModelRows = config.options.get("maxModelRows").map(_.toLong)
        .getOrElse(5000000L))
    val out = config.options.getOrElse("outputColumn", "lang_pred")
    val scoreCol = config.options.get("scoreColumn")
    (out +: scoreCol.toSeq).foreach { c =>
      if (input.columns.exists(_.equalsIgnoreCase(c))) throw new ConfigException(
        s"$transformType: output column '$c' already exists on the input — " +
          "rename via outputColumn/scoreColumn instead of silently overwriting")
    }
    ChargramLm.classify(input, config.options("textColumn"), loaded, out, scoreCol)
  }
}
