package graft.operators

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class AssignIdsSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  private val docs = Seq(
    (30L, "b", "x"), (10L, "a", "y"), (20L, "b", "z"),
    (40L, "a", "w"), (50L, "c", "v"))

  test("dense ids follow the multi-column total order") {
    val out = AssignIdsTransform(docs.toDF("doc", "lang", "text"),
      TransformConfig("a", "assign_ids", Map("orderBy" -> "lang, doc")), ctx)
    out.columns.toSeq shouldBe Seq("doc", "lang", "text", "row_id")
    out.select("doc", "row_id").as[(Long, Long)].collect().sortBy(_._2) shouldBe
      Array((10L, 0L), (40L, 1L), (20L, 2L), (30L, 3L), (50L, 4L))
  }

  test("start offset and idName; partition-count invariance") {
    def ids(nPart: String) = AssignIdsTransform(
      spark.createDataFrame(docs).toDF("doc", "lang", "text").repartition(3),
      TransformConfig("a", "assign_ids", Map("orderBy" -> "doc",
        "idName" -> "seq", "start" -> "100", "numPartitions" -> nPart)), ctx)
      .select("doc", "seq").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq((10L, 100L), (20L, 101L), (30L, 102L), (40L, 103L), (50L, 104L))
    ids("1") shouldBe expected
    ids("4") shouldBe expected
    ids("7") shouldBe expected
  }

  test("user columns named __one/__cb survive — helper names are minted " +
    "collision-free instead of silently overwriting and dropping them") {
    val out = AssignIdsTransform(
      docs.map { case (d, l, t) => (d, l, t) }.toDF("doc", "__one", "__cb"),
      TransformConfig("a", "assign_ids", Map("orderBy" -> "doc")), ctx)
    out.columns.toSeq shouldBe Seq("doc", "__one", "__cb", "row_id")
    out.select("doc", "__one", "__cb", "row_id").as[(Long, String, String, Long)]
      .collect().sortBy(_._4).toSeq shouldBe Seq(
        (10L, "a", "y", 0L), (20L, "b", "z", 1L), (30L, "b", "x", 2L),
        (40L, "a", "w", 3L), (50L, "c", "v", 4L))
  }

  test("existing id column and unknown orderBy columns are rejected") {
    an[IllegalArgumentException] should be thrownBy
      AssignIdsTransform(docs.toDF("doc", "lang", "row_id"),
        TransformConfig("a", "assign_ids", Map("orderBy" -> "doc")), ctx)
    AssignIdsTransform.validate(TransformConfig("a", "assign_ids",
      Map("orderBy" -> "doc, nope")),
      docs.toDF("doc", "lang", "text").schema) should not be empty
  }
}
