package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class WindowAggSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    WindowAggTransform(df, TransformConfig("w", "window_agg", opts.toMap), ctx)

  private def series = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
    ("b", 1, 5.0)).toDF("k", "seq", "v")

  test("rows frame: rolling sum over 2 preceding..current") {
    val out = run(series, "partitionBy" -> "k", "orderBy" -> "seq",
      "frameType" -> "rows", "frameStart" -> "-2", "frameEnd" -> "current",
      "aggregations" -> "roll:sum(v)")
      .where("k = 'a'").orderBy("seq")
      .select("roll").collect().map(_.getDouble(0)).toSeq
    out shouldBe Seq(10.0, 30.0, 60.0, 90.0)
  }

  test("default frame: running total and legal lag/lead") {
    val out = run(series, "partitionBy" -> "k", "orderBy" -> "seq",
      "aggregations" -> "running:sum(v),prev:lag(v, 1),nxt:lead(v, 1)")
      .where("k = 'a'").orderBy("seq").collect()
    out.map(_.getAs[Double]("running")).toSeq shouldBe Seq(10.0, 30.0, 60.0, 100.0)
    out.head.isNullAt(out.head.fieldIndex("prev")) shouldBe true
    out(1).getAs[Double]("prev") shouldBe 10.0
    out(2).getAs[Double]("nxt") shouldBe 40.0
  }

  test("spec order is output column order past 4 entries; duplicate aliases rejected") {
    val out = run(series, "partitionBy" -> "k", "orderBy" -> "seq",
      "aggregations" -> "a5:sum(v),a4:avg(v),a3:min(v),a2:max(v),a1:count(v),a0:sum(v)")
    out.columns.toSeq.drop(3) shouldBe Seq("a5", "a4", "a3", "a2", "a1", "a0")
    an[ConfigException] should be thrownBy run(series, "partitionBy" -> "k",
      "orderBy" -> "seq", "aggregations" -> "x:sum(v),x:avg(v)")
  }

  test("range frame: peers by value share the frame") {
    val ties = Seq(("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 4.0)).toDF("k", "seq", "v")
    val out = run(ties, "partitionBy" -> "k", "orderBy" -> "seq",
      "frameType" -> "range", "frameStart" -> "unbounded", "frameEnd" -> "current",
      "aggregations" -> "s:sum(v)")
      .orderBy("seq", "v").select("s").collect().map(_.getDouble(0)).toSeq
    out shouldBe Seq(3.0, 3.0, 7.0) // both seq=1 rows see each other
  }

  test("partition keys shuffle once; partitionBy-less windows are opt-in") {
    val out = run(series, "partitionBy" -> "k", "orderBy" -> "seq",
      "aggregations" -> "s:sum(v)")
    out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange")) shouldBe 1
    an[ConfigException] should be thrownBy
      run(series, "orderBy" -> "seq", "aggregations" -> "s:sum(v)")
    run(series, "orderBy" -> "seq", "aggregations" -> "s:sum(v)",
      "global" -> "true").count() shouldBe 5
    an[ConfigException] should be thrownBy
      run(series, "partitionBy" -> "k", "orderBy" -> "seq",
        "frameType" -> "nope", "aggregations" -> "s:sum(v)")
  }
}
