package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class FrequentItemsSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    FrequentItemsTransform(df, TransformConfig("fi", "frequent_items", opts.toMap), ctx)

  // skewed domain: item "i<k>" appears k times (k = 1..40)
  private def skewed = (1 to 40).flatMap(k => Seq.fill(k)(("g", s"i$k")))
    .toDF("grp", "item_col")

  test("topk: sparse regime returns exact counts in rank order") {
    val top = run(skewed, "columns" -> "item_col", "mode" -> "topk", "k" -> "5")
      .select("item", "est_count", "rank")
      .as[(String, Long, Int)].collect().sortBy(_._3)
    top.map(_._1).toSeq shouldBe Seq("i40", "i39", "i38", "i37", "i36")
    top.map(_._2).toSeq shouldBe Seq(40L, 39L, 38L, 37L, 36L)
    top.map(_._3).toSeq shouldBe Seq(1, 2, 3, 4, 5)
  }

  test("incremental: merge(build(day1), build(day2)) = build(all) exactly " +
    "while items fit the sketch") {
    val day1 = (1 to 20).flatMap(k => Seq.fill(k)(("g", s"i$k"))).toDF("grp", "item_col")
    val day2 = (10 to 40).flatMap(k => Seq.fill(k)(("g", s"i$k"))).toDF("grp", "item_col")
    val merged = run(
      run(day1, "columns" -> "item_col", "groupBy" -> "grp")
        .unionByName(run(day2, "columns" -> "item_col", "groupBy" -> "grp")),
      "columns" -> "item_col", "groupBy" -> "grp", "mode" -> "merge")
    val est = run(merged, "columns" -> "item_col", "mode" -> "estimate", "k" -> "100")
      .select("item", "est_count").as[(String, Long)].collect().toMap
    est("i40") shouldBe 40L
    est("i15") shouldBe (15L + 15L) // overlap adds, not double-sketches
    est("i5") shouldBe 5L
    est.size shouldBe 40
  }

  test("grouped build keeps one sketch row per group; estimate explodes per group") {
    val d = (1 to 90).map(i => (s"g${i % 3}", s"i${i % 9}")).toDF("grp", "item_col")
    val built = run(d, "columns" -> "item_col", "groupBy" -> "grp")
    built.count() shouldBe 3
    built.columns.toSeq shouldBe Seq("grp", "item_col_topk")
    val est = run(built, "columns" -> "item_col", "mode" -> "estimate", "k" -> "2")
    est.count() shouldBe 6 // 2 items per group
    est.columns.toSeq shouldBe Seq("grp", "item", "est_count", "rank")
  }

  test("validation: bad mode, k < 1, capacity < k, multi-column estimate fail fast") {
    a[ConfigException] should be thrownBy
      run(skewed, "columns" -> "item_col", "mode" -> "nope")
    a[ConfigException] should be thrownBy
      run(skewed, "columns" -> "item_col", "k" -> "0")
    a[ConfigException] should be thrownBy
      run(skewed, "columns" -> "item_col", "k" -> "50", "maxItemsTracked" -> "10")
    a[ConfigException] should be thrownBy
      run(skewed, "columns" -> "item_col,grp", "mode" -> "topk")
    // a carried column named like an output/staging column would emit a
    // silently duplicate-named (or ambiguous) frame — rejected loudly
    val clash = (1 to 9).map(i => (s"r$i", s"i${i % 3}")).toDF("rank", "item_col")
    a[ConfigException] should be thrownBy
      run(clash, "columns" -> "item_col", "mode" -> "topk",
        "groupBy" -> "rank")
  }
}
