package graft.sources

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.{SinkConfig, SourceConfig, WriteMode}
import graft.sinks.{FileSink, KafkaFileSink}

class SourcesSinksSpec extends SparkTestBase {
  import spark.implicits._
  private def ctx = RunContext(spark, "test", "run")

  test("file source/sink roundtrip: parquet, csv (header+delimiter), json") {
    val df = Seq(("ann", 34, "a@x.io"), ("bo", 28, "b@x.io")).toDF("username", "age", "email")
    for (fmt <- Seq("parquet", "csv", "json")) {
      val dir = tmpDir(s"rt-$fmt")
      val extra = if (fmt == "csv") Map("header" -> "true", "delimiter" -> "|") else Map.empty[String, String]
      FileSink.write(df, SinkConfig("file", Map("path" -> dir, "format" -> fmt) ++ extra,
        WriteMode.Overwrite), ctx)
      val back = FileSource.read(SourceConfig("file",
        Map("path" -> dir, "format" -> fmt) ++ extra ++
          (if (fmt == "csv") Map("inferSchema" -> "true") else Map.empty)))
      back.count() shouldBe 2
      back.columns.toSet shouldBe Set("username", "age", "email")
    }
  }

  test("explicit DDL schema is enforced (skips inference) and validates config") {
    val dir = tmpDir("ddl")
    Seq(("x", 1)).toDF("name", "v").write.mode("overwrite").json(dir)
    val df = FileSource.read(SourceConfig("file",
      Map("path" -> dir, "format" -> "json", "schema" -> "name STRING, v LONG")))
    df.schema.simpleString shouldBe "struct<name:string,v:bigint>"
    FileSource.validate(SourceConfig("file", Map("format" -> "carrier-pigeon"))) should have size 2
    an[ConfigException] should be thrownBy FileSource.read(SourceConfig("file", Map.empty))
  }

  test("avro format fails with a capability error, not a raw DataSource lookup") {
    // the image ships no spark-avro module; selecting avro must say so clearly
    val ex = the[ConfigException] thrownBy FileSource.read(
      SourceConfig("file", Map("path" -> "/tmp/x", "format" -> "avro")))
    ex.getMessage should include("spark-avro")
  }

  test("file sink partitionBy produces hive-style dirs; coalesce bounds file count") {
    val dir = tmpDir("part")
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    FileSink.write(df.repartition(4), SinkConfig("file",
      Map("path" -> dir, "coalesce" -> "1"), WriteMode.Overwrite, List("k")), ctx)
    new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("k=")).toSet shouldBe
      Set("k=a", "k=b")
    new java.io.File(s"$dir/k=a").listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1
  }

  test("file sink sortWithinPartitions clusters rows inside each output file") {
    val dir = tmpDir("clustered")
    val df = Seq(5, 1, 4, 2, 3).toDF("v").repartition(3)
    FileSink.write(df, SinkConfig("file",
      Map("path" -> dir, "coalesce" -> "1", "sortWithinPartitions" -> "v"),
      WriteMode.Overwrite), ctx)
    // coalesced to one file THEN clustered → globally sorted rows, i.e.
    // maximally selective min/max row-group stats
    spark.read.parquet(dir).collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3, 4, 5)
  }

  test("kafka file double: sink wraps rows as JSON value; source exposes the kafka contract") {
    val dir = tmpDir("kafka")
    val df = Seq((1, "hello"), (2, "world")).toDF("id", "msg")
    KafkaFileSink.write(df, SinkConfig("kafka-file", Map("path" -> dir)), ctx)
    val back = KafkaFileSource.read(SourceConfig("kafka-file", Map("path" -> dir, "topic" -> "t1")))
    back.columns shouldBe Array("key", "value", "topic", "partition", "offset", "timestamp")
    back.count() shouldBe 2
    val vals = back.selectExpr("get_json_object(value, '$.msg') AS m")
      .as[String].collect().sorted
    vals shouldBe Array("hello", "world")
  }

  test("kafka source validate: any one topic spec accepted, missing " +
    "bootstrap or zero/two topic specs flagged BEFORE the run") {
    def v(opts: Map[String, String]) =
      KafkaSource.validate(SourceConfig("kafka", opts))
    v(Map("kafka.bootstrap.servers" -> "h:9092", "subscribe" -> "t")) shouldBe Nil
    v(Map("kafka.bootstrap.servers" -> "h:9092",
      "subscribePattern" -> "events-.*")) shouldBe Nil
    v(Map("kafka.bootstrap.servers" -> "h:9092",
      "assign" -> """{"t":[0,1]}""")) shouldBe Nil
    v(Map("subscribe" -> "t")).head should include("bootstrap.servers")
    v(Map("kafka.bootstrap.servers" -> "h:9092"))
      .head should include("exactly one of")
    v(Map("kafka.bootstrap.servers" -> "h:9092", "subscribe" -> "t",
      "assign" -> "x")).head should include("exactly one of")
  }

  test("explicitSchema config errors are ConfigExceptions naming the " +
    "option, not raw internal exceptions") {
    // bare type instead of a field list
    val e1 = intercept[ConfigException] {
      FileSource.explicitSchema(SourceConfig("file",
        Map("path" -> "/in", "schema" -> "string")))
    }
    e1.getMessage should include("field list")
    // unparseable DDL
    val e2 = intercept[ConfigException] {
      FileSource.explicitSchema(SourceConfig("file",
        Map("path" -> "/in", "schema" -> "id BIGINT,, nope")))
    }
    e2.getMessage should include("DDL")
    // missing schemaPath file
    val e3 = intercept[ConfigException] {
      FileSource.explicitSchema(SourceConfig("file",
        Map("path" -> "/in"), schemaPath = Some("/no/such/schema.ddl")))
    }
    e3.getMessage should include("/no/such/schema.ddl")
  }

  test("jdbc source/sink validation accumulates errors without drivers") {
    val src = new JdbcSource("postgres", "org.postgresql.Driver")
    src.validate(SourceConfig("postgres", Map("url" -> "http://not-jdbc"))) should have size 2
    src.validate(SourceConfig("postgres", Map(
      "url" -> "jdbc:postgresql://h/db", "dbtable" -> "t",
      "partitionColumn" -> "id"))) should have size 1 // missing bounds+numPartitions
    val sink = new graft.sinks.JdbcSink("postgres", "postgres")
    sink.validate(SinkConfig("postgres", Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "t"),
      WriteMode.Upsert)) shouldBe List("postgres sink: upsert requires 'primaryKey'")
  }
}
