package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines.
 * Everything here is a pure per-row Column composition with NO shuffle and
 * NO UDF/serialization cost — the properties that make it viable over
 * 100 TB of documents. Tokenization is the native codegen'd `split`; the
 * per-token signal walks go through ONE
 * [[graft.functions.expressions.TokenSignals]] pass (the composable
 * filter/aggregate higher-order forms evaluate interpreted per element and
 * are kept as `*Hof` parity references).
 */
object TextFunctions {

  /** Strip ALL leading/trailing whitespace. Spark's 1-arg `trim` removes
    * only ASCII space (0x20) while `split(_, "\\s+")` keeps
    * leading/trailing empty strings, so a doc ending in a newline would
    * otherwise grow a phantom "" token that skews every token-derived
    * signal. The charset overload covers exactly Java-regex `\s`
    * ([ \t\n\f\r]) as a codegen'd string op — a regexp_replace here
    * measured ~10× slower on the corpus-wide signal queries. */
  private def wsStrip(text: Column): Column =
    trim(text, " \t\n\u000B\f\r")

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    split(lower(wsStrip(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(wsStrip(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword count: runs of letters, runs of digits, and individual
    * punctuation marks each count as a token (the usual pre-tokenizer
    * regex shape used by BPE vocabularies). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of punctuation characters to all characters. */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0).otherwise(
      (len - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / len)
  }

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "was", "are")

  /** The shared one-pass signal struct (n, sum_len, stop_hits, alpha,
    * distinct_stop_hits, fp, lang) — every consumer in one projection
    * references the SAME expression tree, so subexpression elimination
    * evaluates the walk once per row. */
  private def signals(text: Column): Column =
    graft.functions.expressions.TokenSignals(
      tokens(text), stopwords, stopwords, langProfiles.map(_._2))

  /** Mean token length (characters). */
  def meanTokenLength(text: Column): Column = {
    val ts = signals(text)
    when(ts.getField("n") === 0, 0.0).otherwise(
      ts.getField("sum_len").cast("double") / ts.getField("n"))
  }

  /** Composable HOF form of [[meanTokenLength]] (interpreted fold); kept
    * as the reference implementation the native expression must match. */
  def meanTokenLengthHof(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Fraction of tokens that are (English) stopwords — the classic
    * fluency/quality signal. */
  def stopwordRatio(text: Column): Column = {
    val ts = signals(text)
    when(ts.getField("n") === 0, 0.0).otherwise(
      ts.getField("stop_hits").cast("double") / ts.getField("n"))
  }

  /** Composable HOF form of [[stopwordRatio]]; parity reference. */
  def stopwordRatioHof(text: Column): Column = {
    val t = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, w => array_contains(stops, w))).cast("double") / size(t))
  }

  /**
   * Composite document-quality score in [0,1]: rewards mid-length docs,
   * a natural stopword rate and mean word length, penalizes punctuation
   * soup. Weights are fixed and deterministic (score is a FEATURE for
   * downstream filtering, not a learned model).
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 3.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val wordLen = meanTokenLength(text)
    val wordScore = when(wordLen.between(3.0, 9.0), 1.0).otherwise(0.4)
    // least()/greatest() SKIP null arguments, so a NULL text would score
    // 0.68 (lenScore and stopScore collapse to their 1.0 caps) and sail
    // through quality filters. Null out ARITHMETICALLY (+ null = null)
    // rather than with a when(): conditional branches are exempt from
    // codegen subexpression elimination, and wrapping the score put the
    // whole TokenSignals walk in a branch — measured 12× slower on q24.
    round(lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 + wordScore * 0.2, 4) +
      length(text).cast("double") * lit(0.0)
  }

  /** Language profiles: high-frequency function words per language (public
    * knowledge: standard stopword lists). */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "des", "une", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "no", "una", "que", "por", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /**
   * N-gram/function-word language ID heuristic: score = stopword hits per
   * language, argmax with deterministic tie-break on language code.
   * `greatest` over (score, lang) structs gives a shuffle-free per-row
   * argmax. A document with ZERO hits for every profile is `und`
   * (unknown) — the struct tie-break would otherwise label all
   * unrecognizable text with the lexicographically-last language code.
   */
  def langId(text: Column): Column = {
    val ts = signals(text)
    // NULL text gives every profile a null score; greatest() would tie on
    // equal-null score fields and the struct tie-break would return the
    // lexicographically-last lang code ("zh"). Null scores fold to -1 so
    // the winner's score still CARRIES the null signal — a leading
    // when(text.isNull) branch would exile the whole TokenSignals walk
    // from codegen subexpression elimination (measured 12× slower).
    val scored = langProfiles.zipWithIndex.map { case ((lang, _), i) =>
      struct(coalesce(element_at(ts.getField("lang"), i + 1), lit(-1)).as("score"),
        lit(lang).as("lang"))
    }
    val top = greatest(scored: _*)
    when(top.getField("score") === -1, lit(null).cast("string"))
      .when(top.getField("score") === 0, lit("und"))
      .otherwise(top.getField("lang"))
  }

  /** Composable HOF form of [[langId]]; parity reference (same -1-fold
    * null handling as the native form). */
  def langIdHof(text: Column): Column = {
    val t = tokens(text)
    val scored = langProfiles.map { case (lang, words) =>
      val profile = array(words.map(lit): _*)
      struct(
        coalesce(size(filter(t, w => array_contains(profile, w))), lit(-1)).as("score"),
        lit(lang).as("lang"))
    }
    val top = greatest(scored: _*)
    when(top.getField("score") === -1, lit(null).cast("string"))
      .when(top.getField("score") === 0, lit("und"))
      .otherwise(top.getField("lang"))
  }

  /**
   * 64-bit rolling-hash document fingerprint: a hash chain over the token
   * stream (acc ← xxhash64(acc, token)), order-sensitive — equal texts get
   * equal fingerprints, reordered texts don't. Per-row fold, codegen'd,
   * and overflow-free under ANSI mode (unlike a polynomial acc*31+h).
   */
  def fingerprint(text: Column): Column =
    signals(text).getField("fp")

  /** Composable HOF form of [[fingerprint]]; parity reference (the native
    * expression drives the chain through XxHash64Function itself, so
    * equality here is equality of the full hash recurrence). */
  def fingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => xxhash64(acc, w))

  /**
   * Corpus-level vocabulary: the `k` most frequent whitespace tokens
   * (lowercased; same tokenization as [[tokens]]) with their counts,
   * deterministically tie-broken by word. With `n > 1` the units are
   * space-joined word n-grams (documents shorter than `n` tokens
   * contribute nothing) — the corpus bigram/trigram count table an n-gram
   * LM or collocation filter builds on. Scale shape: explode feeds a
   * hash aggregate with map-side partial counts — the shuffle carries one
   * row per DISTINCT unit per partition, not per occurrence — and
   * the `orderBy().limit()` plans as TakeOrderedAndProject (per-partition
   * top-k heaps + a driver merge of k·partitions rows), never a global
   * sort of the vocabulary.
   */
  def vocabTopK(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int,
                n: Int = 1): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"vocabTopK: n must be >= 1, got $n")
    // n > 1 uses the native one-pass expression: the HOF formulation
    // (transform+slice+array_join) is evaluated interpreted and made the
    // bigram table the suite's slowest query (see WordNgramStrings docs)
    val units =
      if (n == 1) tokens(col(textCol))
      else graft.functions.expressions.WordNgramStrings(col(textCol), n)
    df.select(explode(units).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
  }

  /**
   * Corpus collocations by pointwise mutual information: the `k` bigrams
   * most over-represented vs their parts' independent frequencies —
   * phrase induction ("new york", "machine learning") for tokenizer vocab
   * and quality work, where raw bigram counts just resurface stopword
   * pairs. PMI = ln(p(xy) / (p(x)·p(y))) with p(x) = c(x)/W (W = total
   * tokens) and p(xy) = c(xy)/B (B = total bigrams); `minCount` floors
   * c(xy) because PMI otherwise ranks hapax pairs first. Tokenization is
   * [[tokens]] / [[graft.functions.expressions.WordNgramStrings]] — the
   * same proven-parity splits as the q45/q82 oracles.
   *
   * Scale shape: three corpus scans (unigram explode, bigram explode,
   * one 1-row totals projection — totals are NOT re-aggregated from the
   * count frames, which would re-plan the explodes); each count shuffle
   * carries map-side partials per DISTINCT unit; the bigram→unigram count
   * joins are vocab-sized on the term key; final ranking is
   * `orderBy().limit()` → TakeOrderedAndProject, never a global sort.
   */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int,
                   minCount: Long = 5L): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"collocations: k must be >= 1, got $k")
    require(minCount >= 1, s"collocations: minCount must be >= 1, got $minCount")
    val uni = df.select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bi = df.select(explode(
        graft.functions.expressions.WordNgramStrings(col(textCol), 2)).as("bigram"))
      .where(length(col("bigram")) > 0)
      .groupBy("bigram").agg(count(lit(1)).as("cxy"))
      .where(col("cxy") >= minCount)
    // tokenCount IS "non-empty token count" (codegen'd) — the interpreted
    // size(filter(...)) HOF form computes the identical value per row
    val totals = df
      .select(tokenCount(col(textCol)).as("nt"))
      .agg(sum(col("nt")).cast("double").as("w_total"),
        sum(greatest(col("nt") - 1, lit(0))).cast("double").as("b_total"))
    bi.withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("cw").as("cx")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("cy")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("cxy").as("n"),
        round(log(col("cxy").cast("double") * col("w_total") * col("w_total") /
          (col("b_total") * col("cx") * col("cy"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /**
   * Corpus TF-IDF: one row per (doc, term) with the term frequency, the
   * term's document frequency, and the smooth-idf score
   * `tf * (ln((1 + N) / (1 + df)) + 1)` (the sklearn formulation — never
   * negative, never divides by zero). Tokenization is [[tokens]], the same
   * proven-parity whitespace split the vocabulary and token-count oracles
   * use.
   *
   * Scale shape: the (doc, term) count is the only full-corpus tokenize +
   * shuffle and is computed ONCE (see [[sharedTf]]); document frequencies
   * aggregate that frame (vocab-sized partials), the 1-row corpus count
   * broadcasts, and the df-side join shuffles on `term`, the natural
   * co-partitioning key. Nothing is ever collected to the driver.
   */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val tf = sharedTf(df, idCol, textCol)
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)), 4)
          .as("tfidf"))
  }

  /**
   * BM25 term scores: `idf * tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))`
   * with the standard positive idf `ln(1 + (N − df + 0.5)/(df + 0.5))` —
   * tfidf with saturation (k1) and document-length normalization (b), the
   * default lexical retrieval scorer. Same aggregation skeleton as
   * [[tfidf]] plus a per-doc length frame derived FROM the tf frame (no
   * extra corpus scan) and a broadcast 1-row average length.
   */
  def bm25(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val tf = sharedTf(df, idCol, textCol)
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val docLen = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(docLen.agg(avg(col("dl").cast("double")).as("avgdl"))))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(docFreq, "term").join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("dl"), round(idf * norm, 4).as("bm25"))
  }

  /**
   * Per-document token Shannon entropy (bits) plus token totals — the
   * information-density quality signal: near-zero entropy flags degenerate
   * repetition ("spam spam spam…"), unusually high entropy flags
   * gibberish/encoded blobs. Computed as `log2(T) − Σ n·log2(n) / T` over
   * the per-document term frequencies — algebraically `−Σ p·log2(p)` but
   * with one log per DISTINCT token instead of per occurrence.
   *
   * Scale shape: same skeleton as [[tfidf]] — the (doc, term) count is the
   * only full-corpus shuffle (map-side partials collapse repeats), the
   * entropy reduction then aggregates vocab-sized data per document.
   * Documents with no tokens produce no row (there is no distribution to
   * measure), matching SQL semantics.
   */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    termFrequencies(df, idCol, textCol)
      .groupBy("doc_id")
      .agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("n_unique"),
        round(log2(sum("tf")) - sum(col("tf") * log2(col("tf"))) / sum("tf"), 4)
          .as("token_entropy"))

  /**
   * Statistical language-model quality score: each document's average
   * negative log-likelihood under the corpus's OWN character n-gram
   * unigram model — `-Σ tf·ln(count(gram)/total) / Σ tf`. Documents whose
   * character statistics diverge from the corpus (encoded blobs, foreign
   * scripts, markup soup) score high; repetitive boilerplate scores low —
   * the classic model-based outlier filter, with the corpus itself as the
   * model (no external LM needed). Documents shorter than `n` characters
   * produce no row.
   *
   * Scale shape: the (doc, gram, tf) frame is computed with ZERO shuffle —
   * all of a document's grams live in its row, so repeats collapse in the
   * per-row [[graft.functions.expressions.ItemCounts]] hash map instead of
   * a cluster-wide exchange of one row per gram occurrence (profiled at
   * sf0.1, that exchange was the whole query: 1.35 s of 1.6 s). What
   * remains: a vocabulary-sized gram-count aggregation (char n-gram vocab
   * is alphabet^n-bounded; map-side partials collapse to vocab size per
   * partition), a 1-row broadcast total derived from it, the gram join
   * (tf's one exchange, on its natural co-partitioning key — AQE converts
   * it to broadcast-hash when the runtime vocab is small), and a final
   * per-document reduction whose partial aggregation collapses each doc
   * before its exchange (explode preserves row locality).
   */
  /** The (doc_id, gram, tf) char n-gram frame — the ONE place encoding
    * the gram contract (lowercasing, the >= n length gate that drops
    * short docs, per-row repeat collapse in the native
    * [[graft.functions.expressions.ItemCounts]] pass — see charGramNll's
    * scale note). charGramNll and importanceScore both build their
    * models from it; a semantics change here keeps their oracles (q79,
    * q129) in lockstep instead of silently diverging. */
  private[graft] def charGramTermFrequencies(df: org.apache.spark.sql.DataFrame,
                                      idCol: org.apache.spark.sql.Column,
                                      textCol: String, n: Int)
      : org.apache.spark.sql.DataFrame =
    df.select(idCol.as("doc_id"), lower(col(textCol)).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= n)
      .select(col("doc_id"), explode(graft.functions.expressions.ItemCounts(
        graft.functions.expressions.CharNgramStrings(col("__t"), n))).as("kv"))
      .select(col("doc_id"), col("kv.item").as("gram"), col("kv.cnt").as("tf"))

  def charGramNll(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  n: Int = 3): org.apache.spark.sql.DataFrame = {
    val tf = graft.api.Checkpointing.checkpoint(
      charGramTermFrequencies(df, col(idCol), textCol, n), eager = false)
    val cnt = tf.groupBy("gram").agg(sum("tf").as("cnt"))
    // integer-identical to summing tf directly, and one fewer tf consumer
    val total = cnt.agg(sum("cnt").as("total"))
    tf.join(cnt, "gram")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_grams"),
        round(-sum(col("tf") * log(col("cnt").cast("double") / col("total"))) / sum("tf"), 4)
          .as("nll"))
  }

  /**
   * DSIR-style importance score (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): each document's average
   * log-likelihood RATIO between a target (high-quality reference) char
   * n-gram model and the raw corpus's own model —
   * `Σ tf·[ln p_target(g) − ln p_raw(g)] / Σ tf`, add-one smoothed over
   * the UNION vocabulary so unseen grams are finite under both models.
   * Documents whose character statistics look like the target score
   * high; the scores feed top-k selection or weighted sampling (the
   * resampling half composes from `quantile_filter` / `sample`).
   * Documents shorter than `n` characters produce no row, like
   * [[charGramNll]].
   *
   * Scale shape mirrors charGramNll: the (doc, gram, tf) frame is a
   * zero-shuffle [[graft.functions.expressions.ItemCounts]] projection
   * (checkpointed once — the raw model and the scoring join both read
   * it); both models reduce to vocabulary-bounded count frames
   * (alphabet^n), merged with one full-outer join into a model frame
   * that is checkpointed (scalars + scoring read it) and BROADCAST into
   * the scoring join, so the corpus-side frame never reshuffles on gram;
   * totals and vocab size ride a 1-row broadcast. The target corpus is
   * scanned exactly once regardless of its size.
   */
  def importanceScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, target: org.apache.spark.sql.DataFrame,
                      targetTextCol: String, n: Int = 3)
      : org.apache.spark.sql.DataFrame =
    // the target needs no per-doc identity — a constant id rides through
    // the shared gram builder and grouping by gram sums it away
    importanceScoreFromCounts(df, idCol, textCol,
      charGramTermFrequencies(target, lit(0L), targetTextCol, n)
        .groupBy("gram").agg(sum("tf").as("tgt_cnt")), n)

  /** [[importanceScore]] with the target MODEL handed in as a
    * (gram, tgt_cnt) count frame — the persisted-store path (a
    * single-label `chargram_lm` store IS this frame), so the nightly
    * pattern never re-scans the target corpus: run N trains the target
    * model once, every later run pays zero target-side scans. */
  def importanceScoreFromCounts(df: org.apache.spark.sql.DataFrame, idCol: String,
                                textCol: String,
                                tgtCounts: org.apache.spark.sql.DataFrame,
                                n: Int = 3): org.apache.spark.sql.DataFrame = {
    val tf = graft.api.Checkpointing.checkpoint(
      charGramTermFrequencies(df, col(idCol), textCol, n), eager = false)
    val raw = tf.groupBy("gram").agg(sum("tf").as("raw_cnt"))
    val tgt = tgtCounts.select(col("gram"), col("tgt_cnt").cast("long").as("tgt_cnt"))
    // union vocabulary: both smoothed models share one V, so the ratio of
    // two proper distributions stays a proper log-ratio
    val model = graft.api.Checkpointing.checkpoint(
      raw.join(tgt, Seq("gram"), "full_outer")
        .select(col("gram"),
          coalesce(col("raw_cnt"), lit(0L)).as("raw_cnt"),
          coalesce(col("tgt_cnt"), lit(0L)).as("tgt_cnt")),
      eager = false)
    val scalars = model.agg(sum("raw_cnt").as("raw_total"),
      sum("tgt_cnt").as("tgt_total"), count(lit(1)).as("v"))
    tf.join(broadcast(model), Seq("gram")) // inner: every doc gram is in raw
      .crossJoin(broadcast(scalars))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_grams"),
        // + 0.0 collapses IEEE negative zero (a score rounding to -0.0
        // stringifies differently from 0.0 in the driver's compare)
        (round(sum(col("tf") * (
          log((col("tgt_cnt") + lit(1L)).cast("double")
            / (col("tgt_total") + col("v")).cast("double"))
          - log((col("raw_cnt") + lit(1L)).cast("double")
            / (col("raw_total") + col("v")).cast("double"))
        )) / sum("tf"), 4) + lit(0.0)).as("importance"))
  }

  /** The (doc, term, tf) frame consumed by SEVERAL downstream branches
    * (document frequencies, doc lengths, the final join). Handing each
    * branch the raw plan makes Catalyst tokenize and aggregate the whole
    * corpus once PER BRANCH — the branches prune differently, so not even
    * exchange reuse merges them (measured: 3 corpus scans in tfidf). A
    * lazy localCheckpoint materializes tf on first use and lets every
    * branch read the same partitions. The default local checkpoint does
    * not recompute on executor loss — set `spark.graft.checkpoint=reliable`
    * (+ `spark.graft.checkpoint.dir`) on a long cluster job if that
    * matters more than the 2× scan ([[graft.api.Checkpointing]]). */
  private def sharedTf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    graft.api.Checkpointing.checkpoint(
      termFrequencies(df, idCol, textCol), eager = false)

  /** Zero-shuffle (doc, term, tf): per-row repeats collapse in
    * [[graft.functions.expressions.ItemCounts]] — same rows as
    * explode + groupBy(doc, term) without the corpus-wide exchange of one
    * row per token occurrence (see charGramNll's scale note). */
  private def termFrequencies(df: org.apache.spark.sql.DataFrame,
                              idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.expressions.ItemCounts(tokens(col(textCol)))).as("kv"))
      .where(length(col("kv.item")) > 0)
      .select(col("doc_id"), col("kv.item").as("term"), col("kv.cnt").as("tf"))

  /**
   * Repetition signals (Gopher-style quality filters): the fraction of
   * word (or word n-gram) occurrences that are repeats of an earlier one —
   * `1 - distinct/total`. High values flag boilerplate and degenerate
   * machine text. Per-row codegen'd over the native
   * [[graft.functions.expressions.ShingleHashes]] byte scan (order-kept,
   * non-distinct), zero shuffle; degenerate docs (< n tokens, blank)
   * collapse to one whole-text shingle → fraction 0.
   */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val sh = graft.functions.expressions.ShingleHashes(text, n, distinct = false)
    when(size(sh) === 0, 0.0).otherwise(
      round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"), 4))
  }

  /** [[dupNgramFraction]] at the single-word level. */
  def dupWordFraction(text: Column): Column = dupNgramFraction(text, 1)

  /** Gopher §A1.1 "top n-gram character fraction": the share of the
    * document's whitespace-normalized characters covered by occurrences
    * of its single MOST FREQUENT word n-gram — the repetition signal that
    * catches "same slogan 400 times" pages [[dupNgramFraction]] can
    * under-read (one dominant gram vs many scattered repeats). Exact
    * contract, engine-reproducible: tokens = [[tokens]] (lowercased,
    * `\s+`); the elected gram maximizes (count, char length) — further
    * ties cannot change the fraction; covered = count × gram length
    * (single separator spaces included), denominator = the space-joined
    * token string's length; overlapping occurrences can overcount, so the
    * result caps at 1.0; docs with fewer than n tokens score 0.0 (the
    * measure is undefined, and a short doc must not read as maximally
    * repetitive). One native single-pass codegen'd projection
    * ([[graft.functions.expressions.TopNgramFraction]]) — zero shuffle.
    * The equivalent Column-HOF spelling lives in GopherRulesSpec as the
    * parity reference: referenced from `when`/`getField` branches it
    * re-ran the interpreted n-gram walk per reference (measured 7.8 s →
    * 0.2 s at sf0.1 for the native form). */
  def topNgramFraction(text: Column, n: Int): Column =
    graft.functions.expressions.TopNgramFraction(text, n)

  /** Gopher §A1.1 duplicate line fraction: repeats-of-an-earlier-line /
    * participating lines (≥ `minLength` code points), 0.0 for documents
    * with no participating lines. One native walk
    * ([[graft.functions.expressions.DupLineStats]]); `separator` "\n\n"
    * gives the paragraph variant. */
  def dupLineFraction(text: Column, separator: String = "\n",
                      minLength: Int = 1): Column = {
    val st = graft.functions.expressions.DupLineStats(
      split(text, java.util.regex.Pattern.quote(separator), -1), minLength)
    when(st.getField("n_lines") === 0, 0.0).otherwise(
      round(st.getField("dup_lines").cast("double")
        / st.getField("n_lines"), 4))
  }

  /** Gopher §A1.1 duplicate line CHARACTER fraction: characters inside
    * repeated lines / characters inside all participating lines — the
    * companion that weighs a few repeated LONG lines correctly where
    * [[dupLineFraction]] under-reads them. */
  def dupLineCharFraction(text: Column, separator: String = "\n",
                          minLength: Int = 1): Column = {
    val st = graft.functions.expressions.DupLineStats(
      split(text, java.util.regex.Pattern.quote(separator), -1), minLength)
    when(st.getField("total_chars") === 0, 0.0).otherwise(
      round(st.getField("dup_chars").cast("double")
        / st.getField("total_chars"), 4))
  }

  /** Word n-gram array ("a b c", 2 → ["a b", "b c"]); docs shorter than n
    * tokens get a single shingle of the whole text. */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) <= n, array(array_join(t, " "))).otherwise(
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }
}
