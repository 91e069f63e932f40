package graft.operators

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class DedupAgainstSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")

  test("drops rows whose normalized text exists in the reference view") {
    Seq((1L, "the quick brown fox"), (2L, "existing doc"))
      .toDF("doc_id", "text").createOrReplaceTempView("against_ref")
    val increment = Seq(
      (10L, "the quick brown fox"),   // exact hit
      (11L, "  THE QUICK BROWN FOX"), // normalization hit (trim + lower)
      (12L, "a genuinely new doc"),
      (13L, "existing doc extended")) // substring, NOT a hit
      .toDF("doc_id", "text")
    val out = DedupAgainstTransform(increment,
      TransformConfig("d", "dedup_against",
        Map("textColumn" -> "text", "referenceView" -> "against_ref")), ctx)
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(12L, 13L)
  }

  test("referenceTextColumn override; empty reference keeps everything") {
    Seq((1L, "keep me")).toDF("id", "body").where("id < 0")
      .createOrReplaceTempView("against_empty")
    val out = DedupAgainstTransform(Seq((1L, "keep me")).toDF("doc_id", "text"),
      TransformConfig("d", "dedup_against",
        Map("textColumn" -> "text", "referenceView" -> "against_empty",
          "referenceTextColumn" -> "body")), ctx)
    out.count() shouldBe 1L
  }
}
