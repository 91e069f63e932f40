package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  private val left = Seq(
    (1L, "jonathan smith"), (2L, "mary jones"), (3L, "peter brown"))
  private val right = Seq(
    (11L, "jonathon smith"),  // 1 substitution
    (12L, "mary  jones"),     // 1 insertion
    (13L, "completely other"),
    (14L, "peter brawny"))    // 2 edits, same 4-char block

  private def link(opts: (String, String)*) = {
    right.toDF("rid", "name").createOrReplaceTempView("fuzzy_right")
    FuzzyJoinTransform(left.toDF("id", "name"),
      TransformConfig("f", "join_fuzzy",
        Map("rightDataset" -> "fuzzy_right", "leftColumn" -> "name",
          "rightColumn" -> "name", "maxDistance" -> "2") ++ opts.toMap), ctx)
  }

  test("matches within maxDistance, right columns prefixed, distance exact") {
    val out = link().select("id", "r_rid", "edit_distance")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    out shouldBe Array((1L, 11L, 1), (2L, 12L, 1), (3L, 14L, 2))
  }

  test("typo inside the block prefix escapes (documented recall trade-off)") {
    Seq((21L, "xonathan smith")).toDF("rid", "name")
      .createOrReplaceTempView("fuzzy_right2")
    FuzzyJoinTransform(left.toDF("id", "name"),
      TransformConfig("f", "join_fuzzy",
        Map("rightDataset" -> "fuzzy_right2", "leftColumn" -> "name",
          "rightColumn" -> "name", "maxDistance" -> "2")), ctx)
      .count() shouldBe 0L
  }

  test("maxBlockSize drops mega-blocks instead of going quadratic") {
    val mono = (1 to 50).map(i => (i.toLong, s"aaaa title $i"))
    mono.toDF("rid", "name").createOrReplaceTempView("fuzzy_right3")
    FuzzyJoinTransform(mono.toDF("id", "name"),
      TransformConfig("f", "join_fuzzy",
        Map("rightDataset" -> "fuzzy_right3", "leftColumn" -> "name",
          "rightColumn" -> "name", "maxDistance" -> "1",
          "maxBlockSize" -> "10")), ctx)
      .count() shouldBe 0L
  }

  test("maxBlockSize < 1 and helper-name collisions are rejected, not a " +
    "silently empty join") {
    an[IllegalArgumentException] should be thrownBy link("maxBlockSize" -> "0")
    right.toDF("rid", "name").createOrReplaceTempView("fuzzy_right")
    val clash = left.toDF("id", "name")
      .withColumn("__blk", org.apache.spark.sql.functions.lit("x"))
    an[ConfigException] should be thrownBy
      FuzzyJoinTransform(clash, TransformConfig("f", "join_fuzzy",
        Map("rightDataset" -> "fuzzy_right", "leftColumn" -> "name",
          "rightColumn" -> "name", "maxDistance" -> "2")), ctx)
  }

  test("plan is a hash equi-join on the block, not a nested-loop join") {
    val plan = link().queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
    an[ConfigException] should be thrownBy link("rightColumn" -> "nope").count()
  }
}
