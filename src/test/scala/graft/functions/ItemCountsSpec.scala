package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.ItemCounts
import org.apache.spark.sql.functions._

/** [[ItemCounts]] is the per-row half of a distributed frequency table:
  * `explode(ItemCounts(items))` must yield exactly the rows of
  * `explode(items) + groupBy(id, item).count()` — the shuffle-free
  * equivalence `charGramNll` and `termFrequencies` rely on. */
class ItemCountsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, Seq("a", "b", "a", "c", "a")),
    (2L, Seq("x")),
    (3L, Seq.empty[String]),
    (4L, Seq("", "", "y"))
  ).toDF("id", "items")

  test("explode(ItemCounts) equals explode + groupBy count") {
    val viaExpr = docs.select(col("id"), explode(ItemCounts(col("items"))).as("kv"))
      .select(col("id"), col("kv.item"), col("kv.cnt"))
      .as[(Long, String, Long)].collect().toSet
    val viaAgg = docs.select(col("id"), explode(col("items")).as("item"))
      .groupBy("id", "item").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    viaExpr shouldBe viaAgg
    viaExpr should contain ((1L, "a", 3L))
  }

  test("first-occurrence order, empty array, null array, null elements") {
    docs.where(col("id") === 1)
      .select(ItemCounts(col("items")).as("kv"))
      .selectExpr("transform(kv, x -> x.item)")
      .as[Seq[String]].head() shouldBe Seq("a", "b", "c")
    // empty array -> empty result (no row survives a subsequent explode)
    docs.where(col("id") === 3)
      .select(ItemCounts(col("items")).as("kv"))
      .selectExpr("size(kv)").as[Int].head() shouldBe 0
    // null array -> null out (UnaryExpression null-intolerance)
    Seq(Tuple1(Option.empty[Seq[String]])).toDF("items")
      .select(ItemCounts(col("items")).as("kv"))
      .where(col("kv").isNull).count() shouldBe 1
    // null ELEMENTS are skipped, not counted
    Seq(Tuple1(Seq(Some("a"), None, Some("a")))).toDF("items")
      .select(explode(ItemCounts(col("items"))).as("kv"))
      .select(col("kv.item"), col("kv.cnt"))
      .as[(String, Long)].collect().toSeq shouldBe Seq(("a", 2L))
  }

  test("stays a zero-shuffle codegen'd projection") {
    val plan = docs.select(col("id"), explode(ItemCounts(col("items"))).as("kv"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
