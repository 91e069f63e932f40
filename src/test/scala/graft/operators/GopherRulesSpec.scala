package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private val good =
    "the quick brown fox jumps over the lazy dog and runs off to the hills " +
      "with a happy bark that echoes through the quiet valley all day long"

  private def annotate(rows: Seq[(Long, String)],
                       opts: (String, String)*): Map[Long, (Boolean, String)] = {
    val d = rows.toDF("doc_id", "text")
    GopherRulesTransform(d, TransformConfig("g", "quality_rules",
      Map("textColumn" -> "text") ++ opts.toMap), ctx)
      .selectExpr("doc_id", "gopher_keep", "coalesce(gopher_fail, 'pass')")
      .as[(Long, Boolean, String)].collect()
      .map { case (id, k, f) => id -> (k, f) }.toMap
  }

  test("each rule fires on its planted document, first-failure order") {
    val out = annotate(Seq(
      1L -> good,                                         // passes everything
      2L -> null,                                         // empty
      3L -> "   ",                                        // whitespace-only
      4L -> "too short",                                  // word_count
      5L -> good.split(" ").map(_ * 4).mkString(" "),     // mean_word_length > 10
      6L -> (good + " # # # #"),                          // symbol_ratio 4/32
      8L -> (good + "\nwell...\nmaybe...\nyes..."),       // ellipsis_lines 3/4 > 0.3
      9L -> (good.split(" ").map(_ => "123").mkString(" ")), // alpha_words
      10L -> Seq.fill(30)("zig zag").mkString(" ")        // stopwords (0 hits)
    ), "minWords" -> "10", "minStopwords" -> "2")
    out(1L) shouldBe (true, "pass")
    out(2L) shouldBe (false, "empty")
    out(3L) shouldBe (false, "empty")
    out(4L) shouldBe (false, "word_count")
    out(5L) shouldBe (false, "mean_word_length")
    out(6L) shouldBe (false, "symbol_ratio")
    out(8L) shouldBe (false, "ellipsis_lines")
    out(9L) shouldBe (false, "alpha_words")
    out(10L) shouldBe (false, "stopwords")
  }

  test("bullet_lines fires above the 0.9 fraction") {
    // 1 text line + 10 bullet lines = 10/11 ≈ 0.909 > 0.9; words stay enough
    val bullets = (1 to 10).map(i => s"- item $i point").mkString("\n")
    val out = annotate(Seq(1L -> (good + "\n" + bullets)), "minWords" -> "10")
    out(1L) shouldBe (false, "bullet_lines")
    // at 9 bullet lines (9/10 = 0.9, not >) the doc passes the bullet rule
    val nine = (1 to 9).map(i => s"- item $i point").mkString("\n")
    val out2 = annotate(Seq(1L -> (good + "\n" + nine)), "minWords" -> "10")
    out2(1L)._2 should not be "bullet_lines"
  }

  test("filter mode keeps only passing rows; thresholds overridable") {
    val d = Seq((1L, good), (2L, "too short")).toDF("doc_id", "text")
    val kept = GopherRulesTransform(d, TransformConfig("g", "quality_rules",
      Map("textColumn" -> "text", "mode" -> "filter", "minWords" -> "10")), ctx)
    kept.select("doc_id").as[Long].collect().toSeq shouldBe Seq(1L)
    // default minWords=50 rejects the 28-word good doc too
    val strict = GopherRulesTransform(d, TransformConfig("g", "quality_rules",
      Map("textColumn" -> "text", "mode" -> "filter")), ctx)
    strict.count() shouldBe 0L
  }

  test("zero-shuffle plan; config errors fail fast") {
    val d = Seq((1L, good)).toDF("doc_id", "text")
    val out = GopherRules.annotate(d, "text")
    out.queryExecution.executedPlan.toString should not include "Exchange"
    an[ConfigException] should be thrownBy GopherRulesTransform(
      d, TransformConfig("g", "quality_rules",
        Map("textColumn" -> "text", "mode" -> "nope")), ctx)
    an[ConfigException] should be thrownBy GopherRulesTransform(
      d, TransformConfig("g", "quality_rules",
        Map("textColumn" -> "text", "minWords" -> "abc")), ctx)
    GopherRulesTransform.validate(
      TransformConfig("g", "quality_rules", Map("textColumn" -> "nope")),
      d.schema) should not be empty
  }
}
