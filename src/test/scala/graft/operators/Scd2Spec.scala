package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  // change log: key 1 flips gold→gold (no-op)→silver→silver (no-op)→gold;
  // key 2 starts null then sets a value (null-safe change detection)
  private val log = Seq(
    (1L, 10L, Some("gold")), (1L, 20L, Some("gold")), (1L, 30L, Some("silver")),
    (1L, 40L, Some("silver")), (1L, 50L, Some("gold")),
    (2L, 10L, None), (2L, 20L, None), (2L, 30L, Some("bronze")))
    .toDF("cust", "seq", "tier")

  private def run(opts: (String, String)*) =
    Scd2Transform(log, TransformConfig("s", "scd2",
      Map("keyColumns" -> "cust", "timeColumn" -> "seq") ++ opts.toMap), ctx)

  test("no-op updates collapse; validity ranges chain; current flagged") {
    val out = run().select("cust", "tier", "effective_from", "effective_to", "is_current")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    out shouldBe Array(
      (1L, Some("gold"), 10L, Some(30L), false),
      (1L, Some("silver"), 30L, Some(50L), false),
      (1L, Some("gold"), 50L, None, true),
      (2L, None, 10L, Some(30L), false),       // null run collapses, null-safely
      (2L, Some("bronze"), 30L, None, true))
  }

  test("multi-column compare: change in ANY compared column opens a version") {
    val wide = Seq((1L, 1L, "a", "x"), (1L, 2L, "a", "y"), (1L, 3L, "a", "y"))
      .toDF("k", "t", "c1", "c2")
    val out = Scd2Transform(wide, TransformConfig("s", "scd2",
      Map("keyColumns" -> "k", "timeColumn" -> "t")), ctx) // compare defaults to c1,c2
    out.count() shouldBe 2 // t=2 changes c2; t=3 is a no-op
  }

  test("map-typed compare columns diff via JSON instead of failing; " +
    "pre-existing output columns are rejected, not overwritten") {
    val mapLog = Seq(
      (1L, 10L, Map("a" -> "1")), (1L, 20L, Map("a" -> "1")),
      (1L, 30L, Map("a" -> "2"))).toDF("cust", "seq", "meta")
    val out = Scd2Transform(mapLog, TransformConfig("s", "scd2",
      Map("keyColumns" -> "cust", "timeColumn" -> "seq")), ctx)
      .select("cust", "effective_from", "effective_to")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._2)
    out shouldBe Array((1L, 10L, Some(30L)), (1L, 30L, None)) // no-op collapsed
    // stale history columns in the input must fail loudly
    val stale = log.withColumn("is_current",
      org.apache.spark.sql.functions.lit(true))
    val e = intercept[graft.api.ConfigException] {
      Scd2Transform(stale, TransformConfig("s", "scd2",
        Map("keyColumns" -> "cust", "timeColumn" -> "seq")), ctx)
    }
    e.getMessage should include("already exist")
  }

  test("one exchange for both windows; config errors fail fast") {
    val plan = run().queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    an[ConfigException] should be thrownBy
      Scd2Transform(log.select("cust", "seq"), TransformConfig("s", "scd2",
        Map("keyColumns" -> "cust", "timeColumn" -> "seq")), ctx)
    Scd2Transform.validate(TransformConfig("s", "scd2",
      Map("keyColumns" -> "ghost", "timeColumn" -> "seq")), log.schema) should not be empty
  }
}
