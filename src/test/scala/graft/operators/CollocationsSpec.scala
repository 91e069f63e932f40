package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  // "new york" always co-occurs (PMI high); "the of" pairs are frequent but
  // their parts are everywhere (PMI ~ 0); counts are hand-checkable
  private val docs = Seq.tabulate(8)(i =>
    (i.toLong, s"the new york times of the day $i and the rest of it"))
    .toDF("doc_id", "text")

  private def run(opts: (String, String)*) =
    CollocationsTransform(docs, TransformConfig("c", "collocations",
      Map("textColumn" -> "text", "k" -> "100", "minCount" -> "2") ++ opts.toMap), ctx)

  test("hand-computed PMI: perfect collocation tops stopword pairs") {
    val out = run().select("bigram", "n", "pmi")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus: 8 docs x 13 tokens => W = 104, B = 8 * 12 = 96
    // c(new york)=8, c(new)=8, c(york)=8: pmi = ln(8·104² / (96·8·8))
    out("new york")._1 shouldBe 8L
    out("new york")._2 shouldBe math.round(
      math.log(8.0 * 104 * 104 / (96.0 * 8 * 8)) * 10000) / 10000.0
    // "of the": once per doc; c(of)=16, c(the)=24
    out("of the")._1 shouldBe 8L
    out("of the")._2 shouldBe math.round(
      math.log(8.0 * 104 * 104 / (96.0 * 16 * 24)) * 10000) / 10000.0
    out("new york")._2 should be > out("of the")._2
  }

  test("minCount floors hapax pairs; ranking is (pmi desc, bigram asc)") {
    // every "day N" bigram occurs once -> dropped at minCount=2
    run().select("bigram").as[String].collect() should not contain "day 0"
    val ranked = run().select("pmi", "bigram").as[(Double, String)].collect()
    ranked.sortBy(r => (-r._1, r._2)).toSeq shouldBe ranked.toSeq
  }

  test("ranking plans as TakeOrderedAndProject, not a global sort") {
    run().queryExecution.executedPlan.toString should include ("TakeOrderedAndProject")
    an[ConfigException] should be thrownBy run("k" -> "0")
    an[ConfigException] should be thrownBy run("minCount" -> "0")
    CollocationsTransform.validate(TransformConfig("c", "collocations",
      Map("textColumn" -> "nope")), docs.schema) should not be empty
  }
}
