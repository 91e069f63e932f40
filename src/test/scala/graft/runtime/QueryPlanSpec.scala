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

  test("q8 registry query pins broadcast-hash join — strategy cannot silently flip") {
    // the exact driver-contract entry, not a lookalike: q8 carries the
    // broadcast hint on the customer side, so a sort-merge plan (two full
    // shuffles of orders+customer) is a regression even if results match
    val df = graft.SparkEntry.queries("q8_join_inner")(spark, sf)
    val p = plan(df)
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("bucketed sink + table source: co-located join plans with zero exchange") {
    import graft.config.{SinkConfig, SourceConfig, WriteMode}
    import graft.sinks.FileSink
    import graft.sources.TableSource
    val dirA = tmpDir("bk-a"); val dirB = tmpDir("bk-b")
    val a = (0 until 10000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "va")
    val b = (0 until 5000).map(i => (i.toLong % 100, i.toLong * 2)).toDF("k", "vb")
    FileSink.write(a, SinkConfig("file", Map("path" -> dirA, "buckets" -> "4",
      "bucketBy" -> "k", "sortBy" -> "k", "table" -> "bk_a"), WriteMode.Overwrite), ctx)
    FileSink.write(b, SinkConfig("file", Map("path" -> dirB, "buckets" -> "4",
      "bucketBy" -> "k", "sortBy" -> "k", "table" -> "bk_b"), WriteMode.Overwrite), ctx)
    try {
      val ta = TableSource.read(SourceConfig("table", Map("table" -> "bk_a")))(spark)
      val tb = TableSource.read(SourceConfig("table", Map("table" -> "bk_b")))(spark)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = ta.join(tb, Seq("k"))
        joined.count() shouldBe 500000L // 100 keys × (100 a-rows × 50 b-rows)
        val p = joined.queryExecution.executedPlan.toString
        p should include("SortMergeJoin")
        p should not include "Exchange" // bucket layout replaces both shuffles
        // sortBy metadata also elides the per-partition sorts? (not required:
        // multiple files per bucket may still need a sort — exchange-free is
        // the property that matters at 100 TB)
        // bucketed group-by on the bucket key also runs exchange-free
        val agg = ta.groupBy("k").count()
        agg.queryExecution.executedPlan.toString should not include "Exchange"
        agg.count() shouldBe 100
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
    // bucketed write without a table name is a typed config error
    an[graft.api.ConfigException] should be thrownBy FileSink.write(a,
      SinkConfig("file", Map("path" -> tmpDir("bk-c"), "buckets" -> "4",
        "bucketBy" -> "k"), WriteMode.Overwrite), ctx)
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

  test("q158 composed DSIR pipeline: scoring rides broadcast models — no " +
    "cartesian product, no gram-keyed shuffle of the corpus, one bounded " +
    "top-k draw") {
    // the composed plan's 100 TB shape: lang_classify is a codegen'd
    // projection against a broadcast model object (no join/exchange for
    // scoring), importance_score's model join broadcasts the
    // vocab-bounded gram frame, and the weighted draw is a bounded-heap
    // top-k (TakeOrderedAndProject), never a global Sort
    val df = graft.SparkEntry.queries("q158_dsir_lang_pipeline")(spark, sf)
    val p = plan(df)
    (p should not).include("CartesianProduct")
    // the k-winner race is the bounded-heap aggregator + BROADCAST
    // semi-join of winner ids (BoundedTopK.semiJoinTopK) — never a
    // global sort of the corpus
    p should include regex "BroadcastHashJoin .*LeftSemi"
    (p should not).include("GlobalSort")
    // scoring never exchanges the corpus on gram: every gram-side join in
    // the plan is broadcast (the corpus-side exchanges that remain are
    // the quantile gate's single-column agg and the draw)
    (p should not).include("SortMergeJoin")
    // nested-loop joins appear only as BROADCAST 1-row stats-frame
    // attaches (model scalars, the quantile threshold — the accepted
    // crossJoin(broadcast(statsFrame)) pattern): every occurrence must
    // build the broadcast side, never stream×stream
    val nlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    nlj should not be empty // the threshold attach is expected
    all(nlj) should include ("BuildRight")
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
