package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.ConfigException

class YamlConfigParserSpec extends AnyFunSuite with Matchers {
  private val parser = new YamlConfigParser()

  private val full =
    """pipelineId: sales-agg
      |name: Sales Aggregation
      |executionMode: batch
      |source:
      |  type: file
      |  options:
      |    path: /data/sales.parquet
      |    format: parquet
      |transformations:
      |  - name: agg
      |    type: aggregation
      |    options:
      |      groupBy: category
      |      aggregations: "total_revenue:sum(price * quantity),n:count(*)"
      |sink:
      |  type: file
      |  writeMode: overwrite
      |  partitionBy: [category]
      |  options:
      |    path: /out/sales
      |quality:
      |  schemaValidation: true
      |  nullChecks:
      |    - column: category
      |      action: quarantine
      |    - column: price
      |      action: fail
      |  duplicateCheck:
      |    columns: [sale_id]
      |  quarantinePath: /quarantine/sales
      |performance:
      |  repartition: 16
      |  cacheIntermediate: true
      |  shufflePartitions: 64
      |  checkpoint: reliable
      |  checkpointDir: /ckpt/sales
      |""".stripMargin

  test("parses the full dialect-C shape") {
    val c = parser.parse(full)
    c.pipelineId shouldBe "sales-agg"
    c.executionMode shouldBe ExecutionMode.Batch
    c.source.sourceType shouldBe "file"
    c.source.options("path") shouldBe "/data/sales.parquet"
    c.transformations should have size 1
    c.transformations.head.options("aggregations") should include("sum(price * quantity)")
    c.sink.writeMode shouldBe WriteMode.Overwrite
    c.sink.partitionBy shouldBe List("category")
    val q = c.quality.get
    q.nullChecks shouldBe List(
      NullCheck("category", NullAction.Quarantine), NullCheck("price", NullAction.Fail))
    q.duplicateCheck.get.columns shouldBe List("sale_id")
    q.quarantinePath shouldBe Some("/quarantine/sales")
    val p = c.performance.get
    (p.repartition, p.cacheIntermediate, p.shufflePartitions) shouldBe (Some(16), true, Some(64))
    (p.checkpoint, p.checkpointDir) shouldBe (Some("reliable"), Some("/ckpt/sales"))
  }

  test("duplicateCheck action reaches the config; false disables; bad " +
    "action is a ConfigException") {
    def cfg(dc: String) = parser.parse(
      s"""pipelineId: p
         |source: {type: file, options: {path: /in}}
         |sink: {type: file, options: {path: /out}}
         |quality:
         |  duplicateCheck: $dc
         |""".stripMargin)
    cfg("{columns: [id], action: fail}").quality.get.duplicateCheck shouldBe
      Some(DuplicateCheck(List("id"), NullAction.Fail))
    cfg("{columns: [id]}").quality.get.duplicateCheck shouldBe
      Some(DuplicateCheck(List("id"), NullAction.Quarantine))
    cfg("true").quality.get.duplicateCheck shouldBe Some(DuplicateCheck())
    cfg("false").quality.get.duplicateCheck shouldBe None
    a[ConfigException] should be thrownBy cfg("{action: sideways}")
  }

  test("placeholders route through resolve() in int/bool fields and " +
    "partitionBy, not just string options") {
    // an int field with a placeholder must fail in the RESOLVER (clear
    // ConfigException naming the variable), never reach toInt and die as
    // NumberFormatException('${ENV:...}')
    val e = intercept[ConfigException] {
      parser.parse(
        """pipelineId: p
          |source: {type: file, options: {path: /in}}
          |sink: {type: file, options: {path: /out}}
          |performance: {shufflePartitions: "${ENV:GRAFT_DOES_NOT_EXIST}"}
          |""".stripMargin)
    }
    e.getMessage should include("GRAFT_DOES_NOT_EXIST")
    // non-numeric / non-boolean literals get the parser's ConfigException
    // contract, never a raw NumberFormat/IllegalArgumentException
    val e2 = intercept[ConfigException] {
      parser.parse(
        """pipelineId: p
          |source: {type: file, options: {path: /in}}
          |sink: {type: file, options: {path: /out}}
          |performance: {repartition: eight}
          |""".stripMargin)
    }
    e2.getMessage should include("integer")
    val e3 = intercept[ConfigException] {
      parser.parse(
        """pipelineId: p
          |source: {type: file, options: {path: /in}}
          |sink: {type: file, options: {path: /out}}
          |performance: {cacheIntermediate: maybe}
          |""".stripMargin)
    }
    e3.getMessage should include("true|false")
    // positive path: an existing env value lands in partitionBy
    val envKey = sys.env.keys.headOption.getOrElse("PATH")
    parser.parse(
      s"""pipelineId: p
         |source: {type: file, options: {path: /in}}
         |sink:
         |  type: file
         |  partitionBy: ["$${ENV:$envKey}"]
         |  options: {path: /out}
         |""".stripMargin).sink.partitionBy shouldBe List(sys.env(envKey))
  }

  test("missing source / sink / pipelineId fail fast") {
    an[ConfigException] should be thrownBy parser.parse("pipelineId: x\nsink: {type: file}")
    an[ConfigException] should be thrownBy parser.parse("pipelineId: x\nsource: {type: file}")
    an[ConfigException] should be thrownBy parser.parse("source: {type: file}\nsink: {type: file}")
  }

  test("ENV placeholder resolution, and unresolvable placeholders throw") {
    val path = sys.env.keys.headOption.getOrElse("PATH")
    parser.resolve(s"pre-$${ENV:$path}-post") shouldBe s"pre-${sys.env(path)}-post"
    an[ConfigException] should be thrownBy parser.resolve("${ENV:GRAFT_NO_SUCH_VAR_42}")
    an[ConfigException] should be thrownBy parser.resolve("${VAULT:secret/db:missing}")
  }

  test("VAULT placeholder goes through the credential provider") {
    val p = new YamlConfigParser(new CredentialProvider {
      def getSecret(path: String, key: String) =
        if (path == "secret/db" && key == "password") Some("s3cret") else None
    })
    p.resolve("${VAULT:secret/db:password}") shouldBe "s3cret"
  }

  test("micro-batch executionMode and streaming section") {
    val c = parser.parse(
      """pipelineId: s
        |executionMode: micro-batch
        |source: {type: file, options: {path: /in}}
        |sink: {type: file, options: {path: /out}}
        |streaming:
        |  checkpointLocation: /ckpt
        |  watermarkColumn: ts
        |  watermarkDelay: 10 minutes
        |  trigger: availableNow
        |  outputMode: update
        |""".stripMargin)
    c.executionMode shouldBe ExecutionMode.MicroBatch
    val st = c.streaming.get
    st.checkpointLocation shouldBe Some("/ckpt")
    st.watermarkDelay shouldBe Some("10 minutes")
    st.outputMode shouldBe "update"
  }
}
