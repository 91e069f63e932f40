package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class TokenCapSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")

  private def corpus = Seq(
    (1L, "web", 40L), (2L, "web", 40L), (3L, "web", 40L), (4L, "web", 40L),
    (5L, "code", 30L), (6L, "code", 30L),
    (7L, "books", 99L)
  ).toDF("doc_id", "source", "n_tok")

  /** The SQL-window restatement of the semantics, on the same data. */
  private def windowExpected(budgetCase: String): Set[Long] = {
    corpus.createOrReplaceTempView("c")
    spark.sql(
      s"""SELECT doc_id FROM (
            SELECT doc_id, $budgetCase AS b,
                   coalesce(sum(n_tok) OVER (PARTITION BY source
                     ORDER BY md5(concat_ws(':', '0', cast(doc_id AS string))), doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM c) WHERE cb < b""").as[Long].collect().toSet
  }

  test("matches the per-group SQL window, boundary doc included") {
    val out = TokenCap.capByBudget(corpus, "doc_id", "n_tok", "source", 70L)
    out.select("doc_id").as[Long].collect().toSet shouldBe windowExpected("70")
    // budget 70 over 40-token docs: cum_before of the 2nd web doc is 40 < 70,
    // of the 3rd is 80 — exactly two web docs survive (boundary doc kept)
    out.where("source = 'web'").count() shouldBe 2L
    // books' single 99-token doc exceeds the budget alone but starts at 0: kept
    out.where("source = 'books'").count() shouldBe 1L
  }

  test("per-group overrides and '-' unlimited; zero budget drops the group") {
    val out = TokenCapTransform(corpus, TransformConfig("t", "token_cap",
      Map("idColumn" -> "doc_id", "weightColumn" -> "n_tok",
        "groupBy" -> "source", "budget" -> "70",
        "budgets" -> "web:0, code:-")), ctx)
    out.where("source = 'web'").count() shouldBe 0L
    out.where("source = 'code'").count() shouldBe 2L
    out.where("source = 'books'").count() shouldBe 1L
    out.columns.toSeq shouldBe Seq("doc_id", "source", "n_tok")
  }

  test("partition-invariant and deterministic across numPartitions") {
    val big = (1L to 400L).map(i => (i, s"s${i % 5}", (i % 13) + 1)).toDF("doc_id", "source", "n_tok")
    val a = TokenCap.capByBudget(big, "doc_id", "n_tok", "source", 150L, numPartitions = 2)
      .select("doc_id").as[Long].collect().toSet
    val b = TokenCap.capByBudget(big.repartition(11), "doc_id", "n_tok", "source", 150L,
      numPartitions = 7).select("doc_id").as[Long].collect().toSet
    a shouldBe b
    a should not be empty
  }

  test("global cap without groupBy; seed changes the draw; null weights count 0") {
    val d = Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, 10L), (3L, null))
      .toDF("doc_id", "n_tok")
    // budget 15: two 10-token docs fill it; the null-weight doc costs 0 so it
    // survives whenever its md5 position precedes the boundary — assert vs
    // the window restatement instead of a hand-pick
    d.createOrReplaceTempView("g")
    val expected = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id,
                  coalesce(sum(coalesce(n_tok, 0)) OVER (
                    ORDER BY md5(concat_ws(':', '0', cast(doc_id AS string))), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM g) WHERE cb < 15""").as[Long].collect().toSet
    TokenCap.capByBudget(d, "doc_id", "n_tok", "", 15L)
      .select("doc_id").as[Long].collect().toSet shouldBe expected
    // a different seed reorders: the KEPT SET may differ but its size can't
    // exceed the budget-implied count; determinism within a seed holds
    val s1 = TokenCap.capByBudget(d, "doc_id", "n_tok", "", 15L, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = TokenCap.capByBudget(d, "doc_id", "n_tok", "", 15L, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    s1 shouldBe s2
  }

  test("driver state is O(partitions): many groups >> partitions stays exact") {
    // 1200 single-or-few-doc groups over 7 partitions — the unbounded-strata
    // shape (domains, not sources). The boundary-tuple chain must reproduce
    // the SQL window exactly; no per-group driver state exists to overflow.
    val many = (1L to 3000L).map(i => (i, s"d${i % 1200}", (i % 17) + 1))
      .toDF("doc_id", "source", "n_tok")
    many.createOrReplaceTempView("c")
    val expected = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id,
                  coalesce(sum(n_tok) OVER (PARTITION BY source
                    ORDER BY md5(concat_ws(':', '0', cast(doc_id AS string))), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM c) WHERE cb < 20""").as[Long].collect().toSet
    TokenCap.capByBudget(many, "doc_id", "n_tok", "source", 20L, numPartitions = 7)
      .select("doc_id").as[Long].collect().toSet shouldBe expected
  }

  test("one group chained across many partitions stays exact") {
    // a single group spanning all 13 partitions exercises the offset chain:
    // every partition's first (and only) group continues the running sum
    val one = (1L to 500L).map(i => (i, "web", (i % 7) + 1))
      .toDF("doc_id", "source", "n_tok")
    one.createOrReplaceTempView("c")
    val expected = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id,
                  coalesce(sum(n_tok) OVER (PARTITION BY source
                    ORDER BY md5(concat_ws(':', '0', cast(doc_id AS string))), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM c) WHERE cb < 300""").as[Long].collect().toSet
    TokenCap.capByBudget(one, "doc_id", "n_tok", "source", 300L, numPartitions = 13)
      .select("doc_id").as[Long].collect().toSet shouldBe expected
    // partition invariance for the same chain
    TokenCap.capByBudget(one.repartition(3), "doc_id", "n_tok", "source", 300L,
      numPartitions = 2).select("doc_id").as[Long].collect().toSet shouldBe expected
  }

  test("config errors fail fast; non-integral weight rejected") {
    an[ConfigException] should be thrownBy TokenCapTransform(corpus,
      TransformConfig("t", "token_cap", Map("idColumn" -> "doc_id",
        "weightColumn" -> "n_tok", "budget" -> "10", "budgets" -> "web")), ctx)
    // well-formed budgets with groupBy FORGOTTEN must be rejected, not
    // silently capped by the default budget
    an[ConfigException] should be thrownBy TokenCapTransform(corpus,
      TransformConfig("t", "token_cap", Map("idColumn" -> "doc_id",
        "weightColumn" -> "n_tok", "budget" -> "10",
        "budgets" -> "web:5")), ctx)
    an[ConfigException] should be thrownBy TokenCapTransform(corpus,
      TransformConfig("t", "token_cap", Map("idColumn" -> "doc_id",
        "weightColumn" -> "n_tok", "budget" -> "10", "budgets" -> "web:abc")), ctx)
    val dbl = corpus.selectExpr("doc_id", "source", "cast(n_tok as double) as n_tok")
    an[ConfigException] should be thrownBy TokenCapTransform(dbl,
      TransformConfig("t", "token_cap", Map("idColumn" -> "doc_id",
        "weightColumn" -> "n_tok", "budget" -> "10")), ctx)
    TokenCapTransform.validate(TransformConfig("t", "token_cap",
      Map("idColumn" -> "nope", "weightColumn" -> "n_tok", "budget" -> "1")),
      corpus.schema) should not be empty
  }
}
