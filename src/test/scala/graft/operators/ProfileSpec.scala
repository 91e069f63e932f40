package graft.operators

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def d = Seq[(java.lang.Long, java.lang.Double)](
    (1L, 1.0), (2L, 2.0), (3L, null), (4L, 4.0)).toDF("id", "v")

  test("profile: one row per column with exact stats, nulls counted") {
    val out = Profile.profile(d, Seq("id", "v"), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    out.keySet shouldBe Set("id", "v")
    val v = out("v")
    v.getLong(1) shouldBe 3    // n_values (non-null)
    v.getLong(2) shouldBe 1    // n_nulls
    v.getLong(3) shouldBe 3    // n_distinct
    v.getDouble(4) shouldBe 1.0
    v.getDouble(5) shouldBe 4.0
    v.getDouble(6) shouldBe 2.3333 // round(7/3, 4)
    v.getDouble(7) shouldBe 2.0    // interpolated median of 1,2,4
    out("id").getLong(2) shouldBe 0
  }

  test("approx mode: single one-pass aggregate, no Expand, sketch aggregates") {
    val q = Profile.profile(d, Seq("id", "v"))
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "Expand" // multi-distinct exactness is opt-in
    plan should include ("partial_approx_count_distinct")
    // approx median still lands on the true value for this tiny input
    q.collect().map(r => r.getString(0) -> r.getDouble(7)).toMap.apply("v") shouldBe 2.0
  }

  test("grouped profile: stats keyed by group, one row per (group, column)") {
    val g = Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "b", 5.0))
      .toDF("id", "grp", "v")
    val out = Profile.profile(g, Seq("v"), exact = true, groupBy = Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    out.keySet shouldBe Set("a", "b")
    out("a").getDouble(8) shouldBe 20.0 // p50: interpolated median of 10, 30
    out("a").getLong(2) shouldBe 2      // n_values
    out("b").getDouble(5) shouldBe 5.0  // min
  }

  test("exact mode: non-numeric column gets exact counts, null numeric stats") {
    val s = Seq[(java.lang.Long, String)](
      (1L, "apple"), (2L, "banana"), (3L, null), (4L, "apple")).toDF("id", "s")
    val out = Profile.profile(s, Seq("s"), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val row = out("s")
    row.getLong(1) shouldBe 3 // n_values: non-null strings counted, not zeroed
    row.getLong(2) shouldBe 1 // n_nulls: only the real null
    row.getLong(3) shouldBe 2 // n_distinct: apple, banana
    row.isNullAt(4) shouldBe true // min/max/avg/p50 null — matches approx path
    row.isNullAt(6) shouldBe true
    row.isNullAt(7) shouldBe true
  }

  test("exact mode: MIXED numeric/non-numeric column — avg and p50 describe " +
    "only the castable values, matching the approx path's try_cast skip") {
    val s = Seq((1L, "1"), (2L, "2"), (3L, "x")).toDF("id", "s")
    val exact = Profile.profile(s, Seq("s"), exact = true).collect().head
    exact.getLong(1) shouldBe 3            // n_values: all three non-null
    exact.getDouble(6) shouldBe 1.5        // avg over castable {1,2}, not /3
    exact.getDouble(7) shouldBe 1.5        // p50 over castable {1,2}
    val approx = Profile.profile(s, Seq("s"), exact = false).collect().head
    approx.getDouble(6) shouldBe exact.getDouble(6)
  }

  test("declarative transform validates options and column existence") {
    val out = ProfileTransform(d, TransformConfig("p", "profile",
      Map("columns" -> "id,v", "exact" -> "true")), RunContext(spark, "t", "r"))
    out.count() shouldBe 2
    an[graft.api.ConfigException] should be thrownBy ProfileTransform(
      d, TransformConfig("p", "profile", Map.empty), RunContext(spark, "t", "r"))
    an[IllegalArgumentException] should be thrownBy ProfileTransform(
      d, TransformConfig("p", "profile", Map("columns" -> "nope")), RunContext(spark, "t", "r"))
  }
}
