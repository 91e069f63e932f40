package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class TextSignalsSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    TextSignalsTransform(df, TransformConfig("s", "text_signals",
      (Seq("textColumn" -> "text") ++ opts).toMap), ctx)

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "spam spam spam spam")).toDF("id", "text")

  test("default emits every signal; values agree with the function suite") {
    val out = run(docs)
    out.columns should contain allOf ("n_tokens", "n_bpe_tokens", "n_chars",
      "punct_ratio", "stopword_ratio", "quality_score", "lang_pred",
      "fingerprint", "dup_word_frac", "dup_ngram_frac")
    val r = out.where("id = 1").collect().head
    r.getAs[Int]("n_tokens") shouldBe 9
    r.getAs[String]("lang_pred") shouldBe "en"
    val spammy = out.where("id = 2").collect().head
    spammy.getAs[Double]("dup_word_frac") shouldBe 0.75
  }

  test("signals subset keeps only the requested columns, in one projection") {
    val out = run(docs, "signals" -> "tokens,quality")
    out.columns.toSeq shouldBe Seq("id", "text", "n_tokens", "quality_score")
    // per-row compositions: no exchange anywhere in the plan
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("score-then-filter pipeline shape: thresholds drop the degenerate doc") {
    val scored = run(docs, "signals" -> "dup_words,quality")
    val kept = FilterTransform(scored, TransformConfig("f", "filter",
      Map("condition" -> "dup_word_frac < 0.5")), ctx)
    kept.select("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("unknown signal fails fast, listing the valid names") {
    val e = intercept[ConfigException] { run(docs, "signals" -> "tokens,nope") }
    e.getMessage should include ("nope")
    e.getMessage should include ("dup_ngrams")
  }
}
