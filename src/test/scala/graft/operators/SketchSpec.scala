package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    SketchTransform(df, TransformConfig("sk", "sketch", opts.toMap), ctx)

  test("build + estimate: NDV within HLL error bounds, sketch size bounded") {
    val d = (1 to 20000).map(i => (i % 7, (i % 5000).toLong)).toDF("g", "uid")
    val sketched = run(d, "columns" -> "uid")
    val est = run(sketched, "columns" -> "uid", "mode" -> "estimate")
      .select("uid_ndv").as[Long].head()
    est.toDouble shouldBe 5000.0 +- 250.0 // lgK=12 → ~1.6% typical error
    // fixed-size state: sketch bytes bounded regardless of cardinality
    sketched.select("uid_sketch").as[Array[Byte]].head().length should be < 16384
  }

  test("incremental ingest: merge(build(day1), build(day2)) ≈ build(all)") {
    val day1 = (1 to 6000).map(i => ("d", i.toLong)).toDF("g", "uid")
    val day2 = (4001 to 10000).map(i => ("d", i.toLong)).toDF("g", "uid")
    val merged = run(
      run(day1, "columns" -> "uid", "groupBy" -> "g")
        .unionByName(run(day2, "columns" -> "uid", "groupBy" -> "g")),
      "columns" -> "uid", "groupBy" -> "g", "mode" -> "merge")
    val est = run(merged, "columns" -> "uid", "mode" -> "estimate")
      .select("uid_ndv").as[Long].head()
    est.toDouble shouldBe 10000.0 +- 500.0 // overlap not double-counted
  }

  test("grouped build keeps one sketch row per group; bad mode fails fast") {
    val d = (1 to 100).map(i => (i % 3, i.toLong)).toDF("g", "uid")
    val out = run(d, "columns" -> "uid", "groupBy" -> "g")
    out.count() shouldBe 3
    out.columns.toSeq shouldBe Seq("g", "uid_sketch")
    an[ConfigException] should be thrownBy run(d, "columns" -> "uid", "mode" -> "nope")
  }
}
