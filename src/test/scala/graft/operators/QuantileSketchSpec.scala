package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    QuantileSketchTransform(df, TransformConfig("qs", "quantile_sketch", opts.toMap), ctx)

  test("build + estimate: exact regime returns the inclusive-rank data values") {
    val d = (1 to 100).map(i => ("g", i)).toDF("grp", "v")
    val built = run(d, "columns" -> "v")
    built.columns.toSeq shouldBe Seq("v_kll")
    val est = run(built, "columns" -> "v", "mode" -> "estimate",
      "quantiles" -> "0.25,0.5,0.75,1.0")
    est.columns.toSeq shouldBe Seq("v_p25", "v_p50", "v_p75", "v_p100")
    // inclusive rule: smallest value with rank ≥ p — 25, 50, 75, 100
    est.as[(Double, Double, Double, Double)].head() shouldBe ((25.0, 50.0, 75.0, 100.0))
  }

  test("incremental ingest: merge(build(day1), build(day2)) = build(all) " +
    "in the exact regime; nulls skipped") {
    val day1 = ((1 to 50).map(i => ("d", Integer.valueOf(i))) :+
      ("d", null.asInstanceOf[Integer])).toDF("grp", "v")
    val day2 = (51 to 100).map(i => ("d", Integer.valueOf(i))).toDF("grp", "v")
    val merged = run(
      run(day1, "columns" -> "v", "groupBy" -> "grp")
        .unionByName(run(day2, "columns" -> "v", "groupBy" -> "grp")),
      "columns" -> "v", "groupBy" -> "grp", "mode" -> "merge")
    val est = run(merged, "columns" -> "v", "mode" -> "estimate",
      "quantiles" -> "0.5")
    est.columns.toSeq shouldBe Seq("grp", "v_p50")
    est.select("v_p50").as[Double].head() shouldBe 50.0
  }

  test("quantile labels never leak binary float error (0.29 → p29, not " +
    "p28_999999999999996); k-mismatched merges fail instead of degrading") {
    val d = (1 to 100).map(i => ("g", i)).toDF("grp", "v")
    val built = run(d, "columns" -> "v")
    run(built, "columns" -> "v", "mode" -> "estimate",
      "quantiles" -> "0.29,0.07,0.999").columns.toSeq shouldBe
      Seq("v_p29", "v_p7", "v_p99_9")
    // a store built at k=400 merged at the default k=200 would silently
    // re-sketch history at double the rank error — it must throw
    val bigK = run(d, "columns" -> "v", "sketchK" -> "400")
    val e = intercept[Exception] {
      run(bigK, "columns" -> "v", "mode" -> "merge").collect()
    }
    e.getMessage should include("sketchK")
  }

  test("beyond the exact regime the rank error stays within the KLL bound") {
    val n = 100000
    val d = (1 to n).map(i => ("g", i)).toDF("grp", "v")
    val p50 = run(run(d, "columns" -> "v", "sketchK" -> "200"),
      "columns" -> "v", "mode" -> "estimate", "quantiles" -> "0.5")
      .select("v_p50").as[Double].head()
    // k=200 → ~1.65% normalized rank error (DataSketches table); 3× slack
    math.abs(p50 - n / 2.0) / n should be < 0.05
  }

  test("sketch state is fixed-size regardless of input cardinality") {
    val big = (1 to 200000).map(i => ("g", i)).toDF("grp", "v")
    val bytes = run(big, "columns" -> "v", "sketchK" -> "200")
      .select("v_kll").as[Array[Byte]].head()
    bytes.length should be < 8192
  }

  test("empty group estimates to NULL; validation fails fast") {
    val empty = Seq.empty[(String, Int)].toDF("grp", "v")
    val est = run(run(empty, "columns" -> "v"),
      "columns" -> "v", "mode" -> "estimate", "quantiles" -> "0.5")
    est.where("v_p50 IS NULL").count() shouldBe 1
    a[ConfigException] should be thrownBy
      run(run(empty, "columns" -> "v"), "columns" -> "v",
        "mode" -> "estimate", "quantiles" -> "1.5")
    a[ConfigException] should be thrownBy
      run(empty, "columns" -> "v", "mode" -> "nope")
  }
}
