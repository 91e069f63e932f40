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
