package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class QuantileFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    QuantileFilterTransform(df, TransformConfig("qf", "quantile_filter", opts.toMap), ctx)

  // values 1..100 in one group: exact quantile(0.25)=25.75, (0.75)=75.25
  private def d100 = (1 to 100).map(i => ("g", i)).toDF("grp", "v")

  test("keep: exact global thresholds retain the interpolated middle band") {
    val kept = run(d100, "column" -> "v", "lower" -> "0.25", "upper" -> "0.75",
      "exact" -> "true").select("v").as[Int].collect().sorted
    kept.head shouldBe 26 // 25 < 25.75 < 26
    kept.last shouldBe 75 // 75 < 75.25 < 76
    kept.length shouldBe 50
  }

  test("keep: one-sided lower-only drops the bottom tail, schema unchanged") {
    val kept = run(d100, "column" -> "v", "lower" -> "0.5", "exact" -> "true")
    kept.columns.toSeq shouldBe Seq("grp", "v")
    kept.select("v").as[Int].collect().min shouldBe 51 // q(0.5) = 50.5
  }

  test("keep: per-group thresholds differ; NULL values are dropped") {
    val d = ((1 to 100).map(i => ("a", Integer.valueOf(i))) ++
      (1 to 100).map(i => ("b", Integer.valueOf(i * 1000))) ++
      Seq(("a", null.asInstanceOf[Integer]))).toDF("grp", "v")
    val kept = run(d, "column" -> "v", "lower" -> "0.25", "upper" -> "0.75",
      "exact" -> "true", "groupBy" -> "grp")
    kept.where("v IS NULL").count() shouldBe 0
    kept.where("grp = 'a'").count() shouldBe 50
    // group b's band is scaled by 1000 — a global threshold would empty it
    kept.where("grp = 'b'").select("v").as[Int].collect().min shouldBe 26000
  }

  test("NaN scores drop in keep mode (NaN sorts above every double — a " +
    "lower-only gate would pass them) and clip to null, never to a bound") {
    val d = ((1 to 100).map(i => ("g", i.toDouble)) :+ ("g", Double.NaN))
      .toDF("grp", "v")
    run(d, "column" -> "v", "lower" -> "0.05", "exact" -> "true")
      .where("isnan(v)").count() shouldBe 0
    val clipped = run(d, "column" -> "v", "lower" -> "0.05", "upper" -> "0.95",
      "mode" -> "clip", "exact" -> "true")
    clipped.count() shouldBe 101 // clip removes no rows
    clipped.where("isnan(v)").select("v_clipped").head().isNullAt(0) shouldBe true
  }

  test("approx path lands on the same band edges (data values, not interpolated)") {
    // approx_percentile returns an actual data value at the rank (25/75),
    // where exact interpolates (25.75/75.25) — band membership may differ
    // by the boundary value itself, never more
    val a = run(d100, "column" -> "v", "lower" -> "0.25", "upper" -> "0.75")
      .select("v").as[Int].collect().sorted
    a.head should (be >= 25 and be <= 26)
    a.last should (be >= 75 and be <= 76)
    a shouldBe (a.head to a.last).toArray // contiguous band
  }

  test("clip: winsorizes into the band, keeps every row, nulls stay null") {
    val d = ((1 to 100).map(i => ("g", Integer.valueOf(i))) :+
      ("g", null.asInstanceOf[Integer])).toDF("grp", "v")
    val out = run(d, "column" -> "v", "lower" -> "0.25", "upper" -> "0.75",
      "exact" -> "true", "mode" -> "clip")
    out.count() shouldBe 101
    out.where("v IS NULL AND v_clipped IS NOT NULL").count() shouldBe 0
    val c = out.where("v IS NOT NULL").select("v_clipped").as[Double].collect()
    c.min shouldBe 25.75
    c.max shouldBe 75.25
    // interior values pass through unclamped
    out.where("v = 50").select("v_clipped").as[Double].head() shouldBe 50.0
  }

  test("validation: missing bounds, out-of-range, inverted, bad mode fail fast") {
    a[ConfigException] should be thrownBy run(d100, "column" -> "v")
    a[ConfigException] should be thrownBy
      run(d100, "column" -> "v", "lower" -> "1.5")
    a[ConfigException] should be thrownBy
      run(d100, "column" -> "v", "lower" -> "0.9", "upper" -> "0.1")
    a[ConfigException] should be thrownBy
      run(d100, "column" -> "v", "lower" -> "0.1", "mode" -> "nope")
  }

  test("plan shape: thresholds ride a broadcast join, no corpus re-shuffle") {
    val plan = run(d100, "column" -> "v", "lower" -> "0.25", "groupBy" -> "grp")
      .queryExecution.executedPlan.toString
    plan should include("Broadcast")
  }
}
