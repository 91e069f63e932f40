package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class FillNaSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  private val holey = Seq(
    (1L, Some("en"), Some(10L)), (2L, None, Some(20L)), (3L, Some("de"), None),
    (4L, None, None))
    .toDF("id", "lang", "score")

  private def run(opts: (String, String)*) =
    FillNaTransform(holey, TransformConfig("f", "fillna", opts.toMap), ctx)

  test("fill: typed literals per column, others untouched") {
    val out = run("values" -> "lang:unk, score:-1")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    out shouldBe Array((1L, "en", 10L), (2L, "unk", 20L),
      (3L, "de", -1L), (4L, "unk", -1L))
  }

  test("fill literals coerce by TARGET column type: numeric-looking " +
    "strings fill string columns verbatim; type mismatches fail loudly") {
    val zips = Seq((1L, Some("10001")), (2L, None: Option[String])).toDF("id", "zip")
    FillNaTransform(zips, TransformConfig("f", "fillna",
      Map("values" -> "zip:00501")), ctx)
      .as[(Long, String)].collect().toMap.apply(2L) shouldBe "00501"
    an[graft.api.ConfigException] should be thrownBy
      run("values" -> "score:not-a-number")
    an[graft.api.ConfigException] should be thrownBy
      run("values" -> "nope:1") // unknown column
  }

  test("a quoted fill literal carries a comma through the list split") {
    val cities = Seq((1L, Some("NYC")), (2L, None: Option[String])).toDF("id", "city")
    FillNaTransform(cities, TransformConfig("f", "fillna",
      Map("values" -> "city:'San Jose, CA'")), ctx)
      .as[(Long, String)].collect().toMap.apply(2L) shouldBe "San Jose, CA"
  }

  test("drop: any vs all, with and without a column subset") {
    run("mode" -> "drop").select("id").as[Long].collect().sorted shouldBe Array(1L)
    run("mode" -> "drop", "how" -> "all").count() shouldBe 4 // id never null
    run("mode" -> "drop", "columns" -> "score")
      .select("id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("zero-shuffle plan; config errors fail fast") {
    run("values" -> "lang:unk").queryExecution.executedPlan
      .toString should not include "Exchange"
    an[ConfigException] should be thrownBy run("values" -> "justacolumn")
    an[ConfigException] should be thrownBy run("mode" -> "drop", "how" -> "some")
    an[ConfigException] should be thrownBy run("mode" -> "purge")
    FillNaTransform.validate(TransformConfig("f", "fillna",
      Map("values" -> "ghost:1")), holey.schema) should not be empty
  }
}
