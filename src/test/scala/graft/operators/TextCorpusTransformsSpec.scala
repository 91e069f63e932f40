package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig
import graft.streaming.SessionizeTransform

class TextCorpusTransformsSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def t(tp: String, opts: (String, String)*) = TransformConfig("x", tp, opts.toMap)
  private def docs = Seq(
    (1L, "the cat sat"), (2L, "the dog sat sat"), (3L, "the the the")).toDF("doc_id", "text")

  test("vocab_topk transform matches the library function; k validated") {
    val out = VocabTopKTransform(docs, t("vocab_topk", "textColumn" -> "text", "k" -> "2"), ctx)
    out.columns.toSeq shouldBe Seq("word", "n")
    out.as[(String, Long)].collect().toSeq shouldBe
      graft.functions.TextFunctions.vocabTopK(docs, "text", 2).as[(String, Long)].collect().toSeq
    out.as[(String, Long)].collect().head shouldBe ("the", 5L)
    an[ConfigException] should be thrownBy
      VocabTopKTransform(docs, t("vocab_topk", "textColumn" -> "text", "k" -> "0"), ctx)
  }

  test("vocab_topk ngramSize: bigram counts, short docs contribute nothing") {
    val d = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "cat")).toDF("doc_id", "text")
    val out = VocabTopKTransform(d,
      t("vocab_topk", "textColumn" -> "text", "k" -> "10", "ngramSize" -> "2"), ctx)
      .as[(String, Long)].collect().toSeq
    out shouldBe Seq(("the cat", 2L), ("cat ran", 1L), ("cat sat", 1L))
    an[ConfigException] should be thrownBy VocabTopKTransform(d,
      t("vocab_topk", "textColumn" -> "text", "k" -> "10", "ngramSize" -> "0"), ctx)
  }

  test("WordNgramStrings: whitespace runs, case folding, edges, trigrams") {
    import graft.functions.expressions.WordNgramStrings
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "\tThe  cat\n sat "),   // leading tab, runs of mixed whitespace
      (2L, "one"),                 // shorter than n
      (3L, ""), (4L, "   "),       // blank-ish
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = d.select(col("doc_id"), WordNgramStrings(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    rows(1L) shouldBe Some(Seq("the cat", "cat sat"))
    rows(2L) shouldBe Some(Seq.empty)
    rows(3L) shouldBe Some(Seq.empty)
    rows(4L) shouldBe Some(Seq.empty)
    rows(5L) shouldBe None // null in, null out
    // trigram window join
    d.where("doc_id = 1").select(WordNgramStrings(col("text"), 3))
      .collect().head.getSeq[String](0) shouldBe Seq("the cat sat")
  }

  test("CharNgramStrings: character grid incl. multibyte, parity with substring form") {
    import graft.functions.expressions.CharNgramStrings
    import org.apache.spark.sql.functions.{col, expr}
    val d = Seq(
      (1L, "abcd"),
      (2L, "cafés"), // multibyte char inside the grid
      (3L, "ab"), (4L, "")).toDF("doc_id", "text")
    val native = d.select(col("doc_id"), CharNgramStrings(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    native(1L) shouldBe Seq("abc", "bcd")
    native(2L) shouldBe Seq("caf", "afé", "fés")
    native(3L) shouldBe Seq.empty
    native(4L) shouldBe Seq.empty
    // bit-parity with the interpreted substring-grid formulation
    val hof = d.where("length(text) >= 3").select(col("doc_id"),
      expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    hof.foreach { case (id, grams) => native(id) shouldBe grams }
  }

  test("normalize_text: NFC composes, flags apply in documented order") {
    // inputs use explicit escapes: \u0301 = combining acute (decomposed
    // e\u0301 composes to \u00e9), \u030A = combining ring, \u0000 = NUL
    val d = Seq(
      (1L, "cafe\u0301 time"),
      (2L, "A\u030A\u0000 b\u0000c\td"),
      (3L, "  plain  ASCII  ")).toDF("doc_id", "text")
    // form only: composition, nothing else
    val nfc = NormalizeTextTransform(d, t("normalize_text", "columns" -> "text"), ctx)
      .as[(Long, String)].collect().toMap
    nfc(1L) shouldBe "caf\u00e9 time"
    nfc(3L) shouldBe "  plain  ASCII  " // already NFC: unchanged object
    // full cleanup: NFC, strip control (NUL out, \t survives to collapse),
    // collapse runs to one space, trim, lowercase — in that order
    val clean = NormalizeTextTransform(d, t("normalize_text",
      "columns" -> "text", "stripControl" -> "true",
      "collapseWhitespace" -> "true", "trim" -> "true",
      "lowercase" -> "true"), ctx).as[(Long, String)].collect().toMap
    clean(1L) shouldBe "caf\u00e9 time"
    clean(2L) shouldBe "\u00e5 bc d"
    clean(3L) shouldBe "plain ascii"
    // NFKC also folds compatibility forms (ligature \uFB01 fi -> fi)
    NormalizeTextTransform(Seq((1L, "\uFB01sh")).toDF("doc_id", "text"),
      t("normalize_text", "columns" -> "text", "form" -> "NFKC"), ctx)
      .as[(Long, String)].collect().head._2 shouldBe "fish"
    an[ConfigException] should be thrownBy NormalizeTextTransform(
      d, t("normalize_text", "columns" -> "text", "form" -> "NFX"), ctx)
    an[ConfigException] should be thrownBy NormalizeTextTransform(
      d, t("normalize_text"), ctx)
  }

  test("unicode_normalize: SQL registration, null passthrough, codegen plan") {
    graft.functions.expressions.GraftExtensions.register(spark)
    Seq((1L, "cafe\u0301"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s").createOrReplaceTempView("un_t")
    val rows = spark.sql(
      "SELECT id, unicode_normalize(s, 'NFC') AS n FROM un_t ORDER BY id")
      .collect()
    rows(0).getString(1) shouldBe "caf\u00e9"
    rows(1).isNullAt(1) shouldBe true
    // stays inside whole-stage codegen (native expression, not a UDF);
    // parquet round-trip — over a LocalRelation the projection
    // constant-folds to a LocalTableScan and no codegen stage exists
    val pq = tmpDir("un-pq")
    spark.table("un_t").write.mode("overwrite").parquet(pq)
    val plan = spark.read.parquet(pq)
      .selectExpr("unicode_normalize(s, 'NFC')")
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegenExec stage marker in the plan string
    plan should include ("*(1) Project")
  }

  test("entropy transform: per-doc rows, options required") {
    val out = EntropyTransform(docs,
      t("entropy", "idColumn" -> "doc_id", "textColumn" -> "text"), ctx)
    out.columns.toSeq shouldBe Seq("doc_id", "n_tokens", "n_unique", "token_entropy")
    // doc 3 is "the the the": zero entropy, 3 tokens, 1 unique
    val r3 = out.where("doc_id = 3").collect().head
    (r3.getLong(1), r3.getLong(2), r3.getDouble(3)) shouldBe ((3L, 1L, 0.0))
    an[ConfigException] should be thrownBy
      EntropyTransform(docs, t("entropy", "textColumn" -> "text"), ctx)
  }

  test("chargram_nll transform: scores land, n validated") {
    val out = ChargramNllTransform(docs,
      t("chargram_nll", "idColumn" -> "doc_id", "textColumn" -> "text", "n" -> "2"), ctx)
    out.columns.toSeq shouldBe Seq("doc_id", "n_grams", "nll")
    out.count() shouldBe 3
    an[ConfigException] should be thrownBy ChargramNllTransform(docs,
      t("chargram_nll", "idColumn" -> "doc_id", "textColumn" -> "text", "n" -> "0"), ctx)
  }

  test("importance_score: target-like docs rank above off-target docs, " +
    "smoothing keeps unseen grams finite, guided errors") {
    // raw corpus: two "english-ish" docs, two digit-soup docs; target
    // model = english-only reference
    val raw = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the log"),
      (3L, "0101 1010 0110 1001"), (4L, "9876 5432 1098 7654")
    ).toDF("doc_id", "text")
    Seq("the bird sat on the branch", "the fish swam past the log")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      .createOrReplaceTempView("imp_target")
    val out = ImportanceScoreTransform(raw,
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text",
        "targetView" -> "imp_target", "n" -> "3"), ctx)
    out.columns.toSeq shouldBe Seq("doc_id", "n_grams", "importance")
    val scores = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    scores.keySet shouldBe Set(1L, 2L, 3L, 4L)
    // every english doc outranks every digit doc; no score is infinite
    // (add-one smoothing covers grams the target never saw)
    for (en <- Seq(1L, 2L); num <- Seq(3L, 4L))
      scores(en) should be > scores(num)
    all(scores.values) should not be Double.NegativeInfinity
    // docs shorter than n drop, like chargram_nll
    ImportanceScoreTransform(Seq((9L, "ab")).toDF("doc_id", "text"),
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text",
        "targetView" -> "imp_target"), ctx).count() shouldBe 0
    an[ConfigException] should be thrownBy ImportanceScoreTransform(raw,
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text"), ctx)
    an[ConfigException] should be thrownBy ImportanceScoreTransform(raw,
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text",
        "targetView" -> "imp_target", "n" -> "0"), ctx)
    an[ConfigException] should be thrownBy ImportanceScoreTransform(raw,
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text",
        "targetView" -> "imp_target", "targetTextColumn" -> "nope"), ctx)
  }

  test("importance_score targetModelView: a persisted minCount=1 store reproduces " +
    "the corpus-mode scores exactly, with guided errors") {
    val raw = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the log"),
      (3L, "0101 1010 0110 1001")).toDF("doc_id", "text")
    val targetDocs = Seq("the bird sat on the branch", "the fish swam past the log")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    targetDocs.createOrReplaceTempView("imp_tv")
    // single-label minCount=1 store over the SAME target corpus
    val store = ChargramLmTransform(
      targetDocs.withColumn("lab", org.apache.spark.sql.functions.lit("tgt")),
      t("chargram_lm", "labelColumn" -> "lab", "textColumn" -> "text",
        "n" -> "3", "minCount" -> "1"), ctx)
    store.createOrReplaceTempView("imp_store")
    def scores(opts: (String, String)*) = ImportanceScoreTransform(raw,
      t("importance_score", (Seq("idColumn" -> "doc_id",
        "textColumn" -> "text", "n" -> "3") ++ opts): _*), ctx)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    scores("targetModelView" -> "imp_store") shouldBe
      scores("targetView" -> "imp_tv")
    // guided errors: both targets, n-stamp mismatch, dangling
    // targetTextColumn, multi-label store without targetLabel
    an[ConfigException] should be thrownBy scores(
      "targetView" -> "imp_tv", "targetModelView" -> "imp_store")
    (the[ConfigException] thrownBy ImportanceScoreTransform(raw,
      t("importance_score", "idColumn" -> "doc_id", "textColumn" -> "text",
        "targetModelView" -> "imp_store", "n" -> "2"), ctx))
      .getMessage should include ("trained with n=3")
    (the[ConfigException] thrownBy scores(
      "targetModelView" -> "imp_store", "targetTextColumn" -> "text"))
      .getMessage should include ("targetTextColumn has no effect")
    ChargramLmTransform(
      Seq(("a", "the cat sat"), ("b", "le chat assis")).toDF("lab", "text"),
      t("chargram_lm", "labelColumn" -> "lab", "textColumn" -> "text",
        "n" -> "3"), ctx).createOrReplaceTempView("imp_multi")
    (the[ConfigException] thrownBy scores("targetModelView" -> "imp_multi"))
      .getMessage should include ("targetLabel")
    (the[ConfigException] thrownBy scores(
      "targetModelView" -> "imp_multi", "targetLabel" -> "zz"))
      .getMessage should include ("not in the store")
    // naming a valid label works
    scores("targetModelView" -> "imp_multi", "targetLabel" -> "a")
      .keySet shouldBe Set(1L, 2L, 3L)
  }

  test("sessionize gap parsing: units, whitespace, rejects garbage") {
    SessionizeTransform.durationMs("30 minutes") shouldBe 30 * 60000L
    SessionizeTransform.durationMs("10s") shouldBe 10000L
    SessionizeTransform.durationMs("250 ms") shouldBe 250L
    SessionizeTransform.durationMs("2h") shouldBe 2 * 3600000L
    SessionizeTransform.durationMs("1 minute") shouldBe 60000L
    an[ConfigException] should be thrownBy SessionizeTransform.durationMs("soon")
    an[ConfigException] should be thrownBy SessionizeTransform.durationMs("-5 s")
  }
}
