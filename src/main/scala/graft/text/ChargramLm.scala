package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.ConfigException

/**
 * Per-label character n-gram language models — the trained upgrade over
 * the stopword-hit `langId` heuristic (`TextFunctions.langId`, 5 fixed
 * languages), in the CCNet / fastText tradition of char-n-gram language
 * identification. The reference engine has no trained-model surface at
 * all (its closest analogue is the fixed filter/map expression registry,
 * `/root/reference/src/main/scala/com/etl/transformer/MapTransformer.scala:31`);
 * this is part of graft's LLM-curation superset.
 *
 * Two halves, split across runs the way the merges / codebook /
 * signature stores are:
 *
 *  - [[modelFrame]] (the `chargram_lm` transform): ONE (label, gram)
 *    aggregation over a labeled corpus → a persistable, parameter-stamped
 *    count store. The shuffle carries map-side (label, gram) partials,
 *    never rows; the result is vocabulary-bounded (≤ labels · alphabet^n
 *    rows) — the codebook-class driver-read size, not corpus-sized.
 *  - [[classify]] (the `lang_classify` transform): score every document
 *    against every label under add-one smoothing over the store's union
 *    vocabulary and append the argmax label. The store BROADCASTS; the
 *    corpus is tokenized once into a checkpointed zero-shuffle
 *    [[graft.functions.expressions.ItemCounts]] gram frame (the
 *    charGramNll / DSIR pattern) and pays two id-keyed aggregations —
 *    the corpus never exchanges on gram.
 *
 * Scoring: log-likelihood of the document's gram multiset under each
 * label's smoothed unigram-of-grams model,
 * `score(L) = Σ_g tf(g) · ln((cnt_L(g) + 1) / (total_L + V))`,
 * where `V` is the store's union vocabulary size, `total_L` the label's
 * stored gram mass, and grams absent from label L (or from the store
 * entirely) take the `cnt = 0` smoothed term. Ties break toward the
 * LARGER label string (max over (score, label) structs) — the exact
 * convention `langId` and its q109 oracle established. Documents that
 * produce no grams (null text, or shorter than `n` chars) classify as
 * `"und"`, like `langId`; null-id documents also yield `"und"` (the id
 * is the append-join key).
 */
object ChargramLm {

  /** Lowercased char-n-gram (gram, tf) frame per key — the SAME gram
    * semantics as `chargram_nll`/`importance_score` (lower → length ≥ n
    * → one-pass native gram slicing), re-stated here because label keys
    * replace doc ids at train time. */
  private def gramFrequencies(df: DataFrame, keyCol: Column, keyName: String,
                              textCol: String, n: Int): DataFrame =
    df.select(keyCol.as(keyName), lower(col(textCol)).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= n)
      .select(col(keyName), explode(graft.functions.expressions.ItemCounts(
        graft.functions.expressions.CharNgramStrings(col("__t"), n))).as("kv"))
      .select(col(keyName), col("kv.item").as("gram"), col("kv.cnt").as("tf"))

  /**
   * The persistable MODEL STORE: per-(label, gram) counts over the
   * labeled corpus, parameter-stamped (`clm_n`, `clm_min_count` — RLE'd
   * to ~nothing in parquet). Null/empty-label rows are refused loudly
   * (a silently skipped stratum would bias every later classify);
   * `minCount` prunes grams rarer than the floor WITHIN their label,
   * bounding store size on noisy corpora. Fails when no (label, gram)
   * survives — an empty model classifies nothing and must say so at
   * train time (the `mergesFrame` empty-corpus discipline).
   */
  def modelFrame(corpus: DataFrame, labelCol: String, textCol: String,
                 n: Int = 3, minCount: Long = 1L): DataFrame = {
    require(n >= 1, s"chargram_lm: n must be >= 1, got $n")
    require(minCount >= 1, s"chargram_lm: minCount must be >= 1, got $minCount")
    // null/blank labels fail IN-PLAN (raise_error), not via a pre-scan:
    // the check rides the one training pass instead of costing a second
    // full corpus read, and a silently skipped stratum would bias every
    // later classification
    val guardedLabel = when(
      col(labelCol).isNull || length(trim(col(labelCol))) === 0,
      raise_error(lit(
        s"chargram_lm: column '$labelCol' carries null/blank labels — a " +
          "silently skipped stratum would bias every later classification; " +
          "filter or fill them explicitly before training")))
      .otherwise(col(labelCol).cast("string"))
    // lazily checkpointed so the train-time empty check below and the
    // caller's store write materialize the aggregation ONCE
    val counts = graft.api.Checkpointing.checkpoint(
      gramFrequencies(corpus, guardedLabel, "label", textCol, n)
        .groupBy("label", "gram").agg(sum("tf").as("cnt"))
        .where(col("cnt") >= minCount)
        .withColumn("clm_n", lit(n))
        .withColumn("clm_min_count", lit(minCount)),
      eager = false)
    // fail HERE, at train time, with the real cause — not at the first
    // load's "zero gram rows" (the mergesFrame empty-corpus discipline)
    if (counts.limit(1).count() == 0) throw new ConfigException(
      s"chargram_lm: no (label, gram) pair survived (every text null or " +
        s"shorter than n=$n characters, or minCount=$minCount pruned " +
        "everything) — a language model cannot be trained on an empty " +
        "gram table; check the text column or lower minCount")
    counts
  }

  /** A validated store: the slim gram frame plus the driver-side scoring
    * constants (per-label totals and the union vocabulary size). */
  final case class Loaded(grams: DataFrame, labelTotals: Map[String, Long],
                          vocabSize: Long, n: Int, minCount: Long)

  /**
   * Load + validate a persisted [[modelFrame]] store: required columns,
   * single-valued stamps, optional caller expectations (`wantN` /
   * `wantMinCount` must match the training stamps — a mismatched `n`
   * would slice different grams and score garbage), and a `maxLabels`
   * guard (the per-label totals are DRIVER state and the classify plan
   * is a docs × labels grid — thousands of labels is a different
   * algorithm, so fail with guidance instead of degrading silently).
   */
  def load(store: DataFrame, wantN: Option[Int] = None,
           wantMinCount: Option[Long] = None, maxLabels: Int = 1000): Loaded = {
    val missing = Seq("label", "gram", "cnt", "clm_n", "clm_min_count")
      .filterNot(store.columns.contains)
    if (missing.nonEmpty) throw new ConfigException(
      s"chargram_lm store is missing column(s) ${missing.mkString(", ")} — " +
        "expected the modelFrame layout (label, gram, cnt, clm_*); rebuild " +
        "the store with the chargram_lm transform")
    val stamps = store.select(col("clm_n").cast("int"),
      col("clm_min_count").cast("long")).distinct().collect()
    if (stamps.length != 1 || stamps.head.anyNull) throw new ConfigException(
      "chargram_lm store carries mixed or null parameter stamps — an " +
        "appended or hand-edited store cannot prove one build; rebuild it " +
        "with a single chargram_lm pass")
    val (gotN, gotMin) = (stamps.head.getInt(0), stamps.head.getLong(1))
    wantN.filter(_ != gotN).foreach { w => throw new ConfigException(
      s"chargram_lm store was trained with n=$gotN but this run requests " +
        s"n=$w — a different gram width slices different grams and scores " +
        "garbage; rebuild the store or align n") }
    wantMinCount.filter(_ != gotMin).foreach { w => throw new ConfigException(
      s"chargram_lm store was trained with minCount=$gotMin but this run " +
        s"requests minCount=$w; rebuild the store or align minCount") }
    // one driver read: per-label totals + union vocab size (label count is
    // bounded by maxLabels, each row two scalars — the codebook read class)
    val totRows = store.groupBy("label").agg(sum("cnt").as("total")).collect()
    if (totRows.length > maxLabels) throw new ConfigException(
      s"chargram_lm store carries ${totRows.length} labels, above " +
        s"maxLabels=$maxLabels — per-label totals are driver state and the " +
        "classify plan is a documents × labels grid; a label set this wide " +
        "needs a different layout (raise maxLabels only if the grid is " +
        "genuinely intended)")
    if (totRows.isEmpty) throw new ConfigException(
      "chargram_lm store holds zero gram rows — rebuild it with the " +
        "chargram_lm transform")
    val v = store.select(countDistinct("gram")).head().getLong(0)
    Loaded(store.select("label", "gram", "cnt"),
      totRows.map(r => r.getString(0) -> r.getLong(1)).toMap, v, gotN, gotMin)
  }

  /**
   * Append the model's argmax label (`outCol`) — and optionally the
   * rounded best log-likelihood (`scoreCol`) — to `df`.
   *
   * Plan shape (the 100 TB contract): the corpus is gram-sliced ONCE into
   * a lazily checkpointed zero-shuffle (id, gram, tf) frame; the store's
   * gram rows BROADCAST into the match join, so the corpus never
   * exchanges on gram; per-(doc, label) matched mass is one id+label
   * aggregation with map-side partials, doc gram totals one id-keyed
   * aggregation over the same checkpointed frame; the docs × labels grid
   * (labels bounded by [[load]]'s maxLabels) fills in the all-unseen
   * smoothed mass so a label with zero matches still competes; the final
   * append is one id-keyed join. Driver state: the label-totals map only.
   */
  def classify(df: DataFrame, idCol: String, textCol: String, loaded: Loaded,
               outCol: String = "lang_pred",
               scoreCol: Option[String] = None): DataFrame = {
    val labelTotals = loaded.labelTotals.toSeq.sortBy(_._1)
    val v = loaded.vocabSize
    val spark = df.sparkSession
    import spark.implicits._
    val totalsDf = labelTotals.toDF("label", "__total")
    val tf = graft.api.Checkpointing.checkpoint(
      gramFrequencies(df.where(col(idCol).isNotNull), col(idCol), "__cid",
        textCol, loaded.n),
      eager = false)
    val docTot = tf.groupBy("__cid").agg(sum("tf").as("__n_grams"))
    // matched mass: smoothed ln-term per stored (label, gram) the doc hits
    val perLabel = tf.join(broadcast(loaded.grams), Seq("gram"))
      .join(broadcast(totalsDf), Seq("label"))
      .groupBy("__cid", "label")
      .agg(sum(col("tf") * log((col("cnt") + lit(1L)).cast("double")
             / (col("__total") + lit(v)).cast("double"))).as("__mll"),
           sum("tf").as("__mtf"))
    // docs × labels grid: labels a doc matched nowhere still score their
    // all-unseen mass — dropping them would hand the argmax to whichever
    // label happened to share one gram
    val scores = docTot.crossJoin(broadcast(totalsDf))
      .join(perLabel, Seq("__cid", "label"), "left")
      .select(col("__cid"), col("label"),
        (coalesce(col("__mll"), lit(0.0))
          + (col("__n_grams") - coalesce(col("__mtf"), lit(0L)))
            * log(lit(1.0) / (col("__total") + lit(v)).cast("double")))
          .as("__score"))
    // ties break toward the LARGER label — the langId / q109 convention
    val best = scores.groupBy("__cid")
      .agg(max(struct(col("__score"), col("label"))).as("__best"))
      .select(col("__cid"),
        col("__best.label").as("__pred"),
        round(col("__best.__score"), 4).as("__pscore"))
    val joined = df.join(best, df(idCol) === best("__cid"), "left")
      .withColumn(outCol, coalesce(col("__pred"), lit("und")))
    scoreCol.fold(joined.drop("__cid", "__pred", "__pscore")) { sc =>
      joined.withColumn(sc, col("__pscore"))
        .drop("__cid", "__pred", "__pscore")
    }
  }
}
