package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = Seq(
    ("A", 5L, 1L), ("A", 10L, 2L), ("A", 19L, 3L), ("A", 20L, 4L), ("B", 10L, 5L)
  ).toDF("k", "p", "pid")
  // [10, 20) on A; [0, 100) on A (wide); [5, 6) on B
  private def intervals = Seq(
    ("A", 10L, 20L, "w1"), ("A", 0L, 100L, "w2"), ("B", 5L, 6L, "w3")
  ).toDF("k", "lo", "hi", "tag")

  test("binned rewrite equals the naive inequality join; bounds are [lo, hi)") {
    val out = RangeJoin.rangeJoin(points, intervals, Seq("k"), "p", "lo", "hi",
      binWidth = 7) // deliberately unaligned bin width
      .select("pid", "range_tag").as[(Long, String)].collect().toSet
    val naive = points.as("l").join(intervals.as("r"),
        col("l.k") === col("r.k") && col("r.lo") <= col("l.p") && col("l.p") < col("r.hi"))
      .select(col("l.pid"), col("r.tag")).as[(Long, String)].collect().toSet
    out shouldBe naive
    out should contain ((2L, "w1"))     // inside [10,20)
    out should contain ((3L, "w1"))     // 19 < 20
    (out should not).contain((4L, "w1")) // hi exclusive
    (out should not).contain((5L, "w3")) // 10 outside [5,6)
    out.count(_._1 == 2L) shouldBe 2     // point in two overlapping windows → two rows
  }

  test("fractional point/bound types are rejected (truncated bins would " +
    "silently mis-join); helper collisions rejected") {
    val dPoints = Seq(("A", 5.7, 1L)).toDF("k", "p", "pid")
    val dIntervals = Seq(("A", 5.9, 6.2, "w")).toDF("k", "lo", "hi", "tag")
    val e = intercept[graft.api.ConfigException] {
      RangeJoin.rangeJoin(dPoints, dIntervals, Seq("k"), "p", "lo", "hi", binWidth = 1)
    }
    e.getMessage should include ("integral")
    val clash = points.withColumnRenamed("pid", "__bin")
    an[graft.api.ConfigException] should be thrownBy
      RangeJoin.rangeJoin(clash, intervals, Seq("k"), "p", "lo", "hi", binWidth = 7)
    // scale-0 decimals are exact integral ticks and stay accepted
    val decPoints = points.selectExpr("k", "cast(p as decimal(18,0)) p", "pid")
    val decIntervals = intervals.selectExpr("k",
      "cast(lo as decimal(18,0)) lo", "cast(hi as decimal(18,0)) hi", "tag")
    RangeJoin.rangeJoin(decPoints, decIntervals, Seq("k"), "p", "lo", "hi",
      binWidth = 7).count() should be > 0L
  }

  test("declarative join_range; oversized intervals fail fast; empty intervals drop") {
    intervals.createOrReplaceTempView("range_ivals")
    val out = RangeJoinTransform(points,
      TransformConfig("r", "join_range", Map(
        "rightDataset" -> "range_ivals", "on" -> "k", "point" -> "p",
        "lo" -> "lo", "hi" -> "hi", "binWidth" -> "7")), RunContext(spark, "t", "r"))
    out.columns should contain allOf ("k", "p", "pid", "range_tag")
    // inverted interval matches nothing instead of exploding
    val inv = Seq(("A", 50L, 10L, "bad")).toDF("k", "lo", "hi", "tag")
    RangeJoin.rangeJoin(points, inv, Seq("k"), "p", "lo", "hi", 7).count() shouldBe 0
    // a 100-wide interval with maxBins=4 must raise, not OOM silently
    val wide = Seq(("A", 0L, 100L, "w")).toDF("k", "lo", "hi", "tag")
    an[Exception] should be thrownBy
      RangeJoin.rangeJoin(points, wide, Seq("k"), "p", "lo", "hi", 7, maxBins = 4).count()
    an[graft.api.ConfigException] should be thrownBy RangeJoinTransform(
      points, TransformConfig("bad", "join_range", Map.empty), RunContext(spark, "t", "r"))
  }

  test("plan is a hash equi-join on (keys, bin), not a nested-loop join") {
    val plan = RangeJoin.rangeJoin(points, intervals, Seq("k"), "p", "lo", "hi", 7)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan.toLowerCase should include ("join")
  }
}
