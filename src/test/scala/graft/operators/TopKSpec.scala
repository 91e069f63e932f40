package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    TopKTransform(df, TransformConfig("tk", "topk",
      (Seq("scoreColumn" -> "score", "idColumn" -> "id", "k" -> "2") ++ opts).toMap), ctx)

  private def rows = Seq(
    (1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
    (4L, "b", 5.0), (5L, "b", 5.0), (6L, "b", 5.0), // ties: ids 4,5 win
    (7L, "c", 1.0)).toDF("id", "grp", "score")

  test("grouped top-k with deterministic ties, full rows preserved") {
    val out = run(rows, "groupBy" -> "grp")
    out.columns.toSeq shouldBe Seq("id", "grp", "score")
    out.select("id").as[Long].collect().toSet shouldBe Set(2L, 3L, 4L, 5L, 7L)
  }

  test("asc direction flips the order; global top-k without groupBy") {
    run(rows, "groupBy" -> "grp", "direction" -> "asc")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 3L, 4L, 5L, 7L)
    run(rows).select("id").as[Long].collect().toSet shouldBe Set(2L, 3L)
  }

  test("window-equivalent result on random data; no Window node in the plan") {
    val rnd = new scala.util.Random(7)
    val big = (1L to 2000L).map(i => (i, s"g${i % 5}", rnd.nextDouble())).toDF("id", "grp", "score")
    val got = run(big, "groupBy" -> "grp", "k" -> "7")
      .select("id").as[Long].collect().toSet
    val expected = big.selectExpr("id", "grp", "score")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(org.apache.spark.sql.functions.col("score").desc,
            org.apache.spark.sql.functions.col("id"))))
      .where("rn <= 7").select("id").as[Long].collect().toSet
    got shouldBe expected
    run(big, "groupBy" -> "grp").queryExecution.executedPlan.toString should not include "Window"
  }

  test("string/UUID ids ride the same partial-aggregate plan, no Window") {
    val s = Seq(
      ("doc-a", "x", 10.0), ("doc-b", "x", 30.0), ("doc-c", "x", 20.0),
      ("doc-d", "y", 5.0), ("doc-e", "y", 5.0), ("doc-f", "y", 5.0)) // ties: d,e win (id asc)
      .toDF("id", "grp", "score")
    val out = run(s, "groupBy" -> "grp")
    out.columns.toSeq shouldBe Seq("id", "grp", "score")
    out.select("id").as[String].collect().toSet shouldBe
      Set("doc-b", "doc-c", "doc-d", "doc-e")
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include ("partial_topkaggregatorstr") // map-side reduction
  }

  test("null and NaN scores drop out; invalid options fail fast") {
    // NaN would break the heap's strict-weak ordering (better(NaN,x) and
    // better(x,NaN) are both false) — it must be excluded, not ranked
    val withNull = Seq((1L, java.lang.Double.valueOf(2.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(Double.NaN)))
      .toDF("id", "score")
    run(withNull, "k" -> "5").select("id").as[Long].collect().toSet shouldBe Set(1L)
    an[ConfigException] should be thrownBy run(rows, "k" -> "0")
    an[ConfigException] should be thrownBy run(rows, "direction" -> "sideways")
    // non-integral, non-string id types still fail fast with guidance
    an[ConfigException] should be thrownBy
      TopKTransform(rows.withColumn("id", org.apache.spark.sql.functions.col("score")),
        TransformConfig("tk", "topk", Map("scoreColumn" -> "score",
          "idColumn" -> "id", "k" -> "1")), ctx)
  }
}
