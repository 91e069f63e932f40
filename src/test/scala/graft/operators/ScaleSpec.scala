package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    ScaleTransform(df, TransformConfig("sc", "scale", opts.toMap), ctx)

  test("zscore: mean 0, sample std 1, golden values") {
    val d = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val got = run(d, "columns" -> "x").select("x_scaled")
      .collect().map(_.getDouble(0)).sorted
    // μ=3, σ_samp=sqrt(2.5)
    val sd = math.sqrt(2.5)
    got.zip(Seq(-2.0, -1.0, 0.0, 1.0, 2.0).map(_ / sd)).foreach {
      case (a, e) => a shouldBe e +- 1e-12
    }
  }

  test("minmax lands exactly in [0,1]; constant columns scale to 0") {
    val d = Seq((10.0, 7.0), (20.0, 7.0), (15.0, 7.0)).toDF("x", "c")
    val out = run(d, "columns" -> "x,c", "method" -> "minmax")
    out.select("x_scaled").collect().map(_.getDouble(0)).sorted.toSeq shouldBe
      Seq(0.0, 0.5, 1.0)
    out.select("c_scaled").collect().map(_.getDouble(0)).toSet shouldBe Set(0.0)
  }

  test("null inputs stay null — including in degenerate (constant) columns") {
    val d = Seq[(java.lang.Double, java.lang.Double)](
      (7.0, 1.0), (7.0, 2.0), (null, null)).toDF("c", "x")
    val out = run(d, "columns" -> "c,x", "method" -> "minmax")
    out.where($"c".isNull).select("c_scaled", "x_scaled").collect().foreach { r =>
      r.isNullAt(0) shouldBe true // degenerate column: null in, null out (not 0.0)
      r.isNullAt(1) shouldBe true
    }
    val z = run(d, "columns" -> "c,x")
    z.where($"c".isNull).select("c_scaled").collect().head.isNullAt(0) shouldBe true
  }

  test("robust: golden (x−med)/(1.4826·MAD); MAD=0 degenerates to 0.0; nulls stay null") {
    // x = 1..5 with an outlier 1000: med=3.5 (interpolated over 6 values),
    // deviations {2.5,1.5,0.5,0.5,1.5,996.5} → MAD=1.5
    val d = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0, 1000.0, null).toDF("x")
    val out = run(d, "columns" -> "x", "method" -> "robust", "exact" -> "true")
    val got = out.where($"x".isNotNull).select("x", "x_scaled")
      .as[(Double, Double)].collect().toMap
    got(1.0) shouldBe (1.0 - 3.5) / (1.4826 * 1.5) +- 1e-12
    got(1000.0) shouldBe (1000.0 - 3.5) / (1.4826 * 1.5) +- 1e-12
    out.where($"x".isNull).select("x_scaled").collect().head.isNullAt(0) shouldBe true
    // outlier robustness: values symmetric around the median stay
    // symmetric after scaling (a zscore's μ would be dragged to ~169)
    got(3.0) + got(4.0) shouldBe 0.0 +- 1e-12
    got(2.0) + got(5.0) shouldBe 0.0 +- 1e-12
    // constant column → MAD 0 → 0.0
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    run(const, "columns" -> "x", "method" -> "robust", "exact" -> "true")
      .select("x_scaled").collect().map(_.getDouble(0)).toSet shouldBe Set(0.0)
  }

  test("robust approx default matches exact on a small frame") {
    val d = (1 to 101).map(_.toDouble).toDF("x")
    val ex = run(d, "columns" -> "x", "method" -> "robust", "exact" -> "true")
      .select("x", "x_scaled").as[(Double, Double)].collect().toMap
    val ap = run(d, "columns" -> "x", "method" -> "robust")
      .select("x", "x_scaled").as[(Double, Double)].collect().toMap
    ex.foreach { case (k, v) => ap(k) shouldBe v +- 1e-9 }
  }

  test("single stats pass broadcast into a projection; stat columns dropped") {
    val d = Seq(1.0, 2.0).toDF("x")
    val out = run(d, "columns" -> "x")
    out.columns.toSeq shouldBe Seq("x", "x_scaled")
    val plan = out.queryExecution.executedPlan.toString
    plan should include ("BroadcastNestedLoopJoin") // 1-row stats side
    an[ConfigException] should be thrownBy run(d, "columns" -> "x", "method" -> "nope")
  }
}
