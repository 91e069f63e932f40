package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class CompressionRatioSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  private def ratios(rows: (Long, String)*): Map[Long, Option[Double]] =
    CompressionRatioTransform(rows.toDF("id", "text"),
      TransformConfig("c", "compression_ratio", Map("textColumn" -> "text")), ctx)
      .select("id", "compression_ratio")
      .as[(Long, Option[Double])].collect().toMap

  private val repetitive = "the same line over and over. " * 200
  private val prose = "Compression distinguishes boilerplate from writing " +
    "because natural language carries fresh information in each clause, " +
    "while generated spam keeps restating one template with tiny edits."
  private val noise = {
    val rng = new scala.util.Random(42)
    Seq.fill(2000)(rng.nextPrintableChar()).mkString
  }

  test("ratio separates repetitive, natural and incompressible text") {
    val r = ratios((1L, repetitive), (2L, prose), (3L, noise))
    r(1L).get should be < 0.1
    r(2L).get should (be > 0.3 and be < 0.9)
    r(3L).get should be > 0.75 // ~95 printable symbols ≈ 6.6 bits/char
    r(1L).get should be < r(2L).get
  }

  test("deterministic across runs; null stays null; empty is 1.0") {
    ratios((1L, repetitive), (2L, prose)) shouldBe
      ratios((1L, repetitive), (2L, prose))
    val r = ratios((1L, null), (2L, ""))
    r(1L) shouldBe None
    r(2L) shouldBe Some(1.0)
  }

  test("level option wired; zero-shuffle plan; bad level fails fast") {
    val out = CompressionRatioTransform(Seq((1L, repetitive)).toDF("id", "text"),
      TransformConfig("c", "compression_ratio",
        Map("textColumn" -> "text", "level" -> "1", "outputColumn" -> "cr")), ctx)
    out.columns should contain("cr")
    out.queryExecution.executedPlan.toString should not include "Exchange"
    // level 9 tries at least as hard as level 1 on highly repetitive input
    val l9 = ratios((1L, repetitive))(1L).get
    out.select("cr").as[Double].head() should be >= l9
    an[ConfigException] should be thrownBy
      CompressionRatioTransform(Seq((1L, "x")).toDF("id", "text"),
        TransformConfig("c", "compression_ratio",
          Map("textColumn" -> "text", "level" -> "0")), ctx)
  }
}
