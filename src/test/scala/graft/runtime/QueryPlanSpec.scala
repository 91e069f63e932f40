package graft.runtime

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig
import graft.operators.{FilterTransform, JoinTransform}

/**
 * Plan-shape assertions, mirroring the reference's QueryPlanAnalysisSpec:
 * what Catalyst is EXPECTED to do to our declarative plans must actually
 * show up in the physical plan — pushdown, pruning, broadcast strategy.
 * These double as optimizer regression tests: at 100 TB a lost pushdown is
 * an outage, not a slowdown.
 */
class QueryPlanSpec extends SparkTestBase {
  import spark.implicits._
  private def ctx = RunContext(spark, "plan", "run")
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter transform pushes predicates into the parquet scan") {
    val df = FilterTransform(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      TransformConfig("f", "filter", Map("condition" -> "l_quantity > 45")), ctx)
    val p = plan(df)
    p should include("PushedFilters")
    p should include regex "PushedFilters: \\[.*GreaterThan\\(l_quantity,45.*\\]"
  }

  test("column projection prunes the parquet read schema") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    p should include("ReadSchema")
    p should include regex "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"
  }

  test("broadcast hint on the join transform yields BroadcastHashJoin") {
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("plan_cust")
    val joined = JoinTransform(
      spark.read.parquet(s"$sf/orders.parquet"),
      TransformConfig("j", "join", Map(
        "rightDataset" -> "plan_cust", "joinType" -> "inner",
        "leftKey" -> "o_custkey", "rightKey" -> "c_custkey", "broadcast" -> "true")), ctx)
    plan(joined) should include("BroadcastHashJoin")
  }

  test("partitionBy sink output enables partition pruning on re-read") {
    val dir = tmpDir("pruning")
    Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("k", "v")
      .write.mode("overwrite").partitionBy("k").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"k" === "a")
    pruned.queryExecution.executedPlan.toString should include regex
      "PartitionFilters: \\[.*k.*\\]"
    pruned.count() shouldBe 2
  }

  test("aggregation plans partial (map-side) + final hash aggregation") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").count()
    val p = plan(df)
    p should include("HashAggregate")
    p should include("partial_count")
  }

  test("the executor's composed pipeline keeps everything in one plan (filter reaches scan through map+agg)") {
    import graft.config._
    val cfg = PipelineConfig(
      pipelineId = "plan-pipe",
      source = SourceConfig("file", Map("path" -> s"$sf/lineitem.parquet")),
      transformations = List(
        TransformConfig("f", "filter", Map("condition" -> "l_quantity > 30")),
        TransformConfig("m", "map", Map("expressions" -> "qty2:l_quantity * 2")),
        TransformConfig("a", "aggregation", Map(
          "groupBy" -> "l_returnflag", "aggregations" -> "s:sum(qty2)"))),
      sink = SinkConfig("file", Map("path" -> "/tmp/unused")))
    val p = plan(new PipelineExecutor().compose(cfg))
    p should include regex "PushedFilters: \\[.*GreaterThan\\(l_quantity,30.*\\]"
    p should include("HashAggregate")
  }
}
