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

  private val refDoc = "the quick brown fox jumps over the lazy dog while " +
    "seventeen astonished penguins watch from a nearby iceberg in complete silence"
  private val freshDoc = "completely unrelated content about spark catalyst " +
    "optimizer rules rewriting logical plans into efficient physical operators"

  test("incremental minhash: reference near-copies drop, fresh docs survive") {
    Seq((1L, refDoc)).toDF("doc_id", "text")
      .createOrReplaceTempView("against_minhash_ref")
    val increment = Seq(
      (10L, refDoc),                                      // exact copy
      (11L, refDoc.replace("astonished ", "")),           // near-copy
      (12L, freshDoc))
      .toDF("doc_id", "text")
    val out = MinhashDedupTransform(increment,
      TransformConfig("d", "dedup_minhash",
        Map("idColumn" -> "doc_id", "textColumn" -> "text",
          "referenceView" -> "against_minhash_ref", "threshold" -> "0.5")), ctx)
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(12L)
  }

  test("minhashNearDupsAgainst: exact copy scores jaccard 1.0 with the ref id") {
    val pairs = graft.dedup.Dedup.minhashNearDupsAgainst(
      Seq((10L, refDoc), (12L, freshDoc)).toDF("doc_id", "text"),
      Seq((1L, refDoc)).toDF("doc_id", "text"),
      "doc_id", "text", "doc_id", "text", threshold = 0.5)
    pairs.select("id", "ref_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq shouldBe Seq((10L, 1L, 1.0))
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
