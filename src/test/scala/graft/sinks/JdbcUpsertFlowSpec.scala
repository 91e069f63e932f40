package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.{SinkConfig, WriteMode}

/**
 * Full upsert flow without database drivers: a parquet-backed "database"
 * stands in for JDBC (the reference's H2 strategy, FR-029), a recording
 * SqlExecutor captures the driver-side transaction, and a replay applies
 * the upsert semantics so idempotency is actually observable
 * (DataLoaderContractSpec:165).
 */
class JdbcUpsertFlowSpec extends SparkTestBase {
  import spark.implicits._
  import graft.testkit.FakeJdbcDb

  test("upsert writes staging, runs dialect SQL in one txn, is idempotent, updates keyed rows") {
    val db = new FakeJdbcDb(spark, tmpDir("fakedb"))
    Seq((1, "old-a", 10.0), (2, "old-b", 20.0)).toDF("id", "name", "total")
      .write.parquet(db.tablePath("sales"))

    val cfg = SinkConfig("postgres",
      Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "sales", "primaryKey" -> "id"),
      WriteMode.Upsert)
    val batch = Seq((2, "new-b", 25.0), (3, "new-c", 30.0)).toDF("id", "name", "total")
    val ctx = RunContext(spark, "p", java.util.UUID.randomUUID().toString)

    db.sink.write(batch, cfg, ctx)
    db.executed.head should (include("ON CONFLICT (id) DO UPDATE SET") and
      include("name = EXCLUDED.name") and include("total = EXCLUDED.total"))
    db.executed.last should startWith("DROP TABLE sales_staging_")
    val after1 = db.read("sales").orderBy("id").as[(Int, String, Double)].collect()
    after1 shouldBe Array((1, "old-a", 10.0), (2, "new-b", 25.0), (3, "new-c", 30.0))

    // idempotency: re-running the identical batch changes nothing
    db.sink.write(batch, cfg, RunContext(spark, "p", java.util.UUID.randomUUID().toString))
    db.read("sales").orderBy("id").as[(Int, String, Double)].collect() shouldBe after1
  }

  test("a batch with duplicate primary keys stages ONE deterministic row " +
    "per key — Postgres ON CONFLICT would abort on the raw batch") {
    val db = new FakeJdbcDb(spark, tmpDir("fakedb-dup"))
    Seq((1, "old-a", 10.0)).toDF("id", "name", "total")
      .write.parquet(db.tablePath("sales"))
    val cfg = SinkConfig("postgres",
      Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "sales", "primaryKey" -> "id"),
      WriteMode.Upsert)
    // id=2 appears twice: survivor is the (keys ++ other columns) minimum
    val batch = Seq((2, "bbb", 9.0), (2, "aaa", 5.0), (3, "ccc", 1.0))
      .toDF("id", "name", "total")
    db.sink.write(batch, cfg, RunContext(spark, "p", java.util.UUID.randomUUID().toString))
    val staging = db.executed.head match {
      case s =>
        val St = """.* FROM (\w+) ON CONFLICT.*""".r
        s match { case St(st) => st }
    }
    db.read(staging).orderBy("id").as[(Int, String, Double)].collect() shouldBe
      Array((2, "aaa", 5.0), (3, "ccc", 1.0))
    db.read("sales").orderBy("id").as[(Int, String, Double)].collect() shouldBe
      Array((1, "old-a", 10.0), (2, "aaa", 5.0), (3, "ccc", 1.0))
  }

  test("upsert pre-dedup tolerates non-orderable (map) tie-break columns — " +
    "keyed by JSON form instead of failing at analysis") {
    val db = new FakeJdbcDb(spark, tmpDir("fakedb-map"))
    Seq((1, "old")).toDF("id", "name").withColumn("attrs",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), org.apache.spark.sql.functions.col("name")))
      .write.parquet(db.tablePath("sales"))
    val cfg = SinkConfig("postgres",
      Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "sales", "primaryKey" -> "id"),
      WriteMode.Upsert)
    val batch = Seq((1, "bbb"), (1, "aaa"), (2, "ccc")).toDF("id", "name")
      .withColumn("attrs", org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), org.apache.spark.sql.functions.col("name")))
    db.sink.write(batch, cfg, RunContext(spark, "p", java.util.UUID.randomUUID().toString))
    db.read("sales").orderBy("id").selectExpr("id", "name", "attrs['k']")
      .as[(Int, String, String)].collect() shouldBe
      Array((1, "aaa", "aaa"), (2, "ccc", "ccc"))
  }

  test("upsert primaryKey resolving only case-insensitively against the " +
    "frame still works (default caseSensitive=false parity)") {
    val db = new FakeJdbcDb(spark, tmpDir("fakedb-case"))
    Seq((1, "old")).toDF("id", "name").write.parquet(db.tablePath("sales"))
    val cfg = SinkConfig("postgres",
      Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "sales",
        "primaryKey" -> "ID"), WriteMode.Upsert)
    db.sink.write(Seq((1, "new"), (2, "two")).toDF("id", "name"), cfg,
      RunContext(spark, "p", java.util.UUID.randomUUID().toString))
    db.read("sales").orderBy("id").as[(Int, String)].collect() shouldBe
      Array((1, "new"), (2, "two"))
  }

  test("a failed merge still drops the committed staging table (no orphan " +
    "accumulation), and the original error propagates") {
    val recorded = mutable.Buffer[String]()
    val failing = new JdbcSink("postgres", "postgres", (_, _, statements) => {
      recorded ++= statements
      if (statements.exists(_.startsWith("INSERT INTO ")))
        throw new RuntimeException("constraint violation")
    }) {
      override protected def jdbcWrite(data: DataFrame, mode: SaveMode, url: String,
                                       table: String, options: Map[String, String]): Unit = ()
    }
    val cfg = SinkConfig("postgres",
      Map("url" -> "jdbc:postgresql://h/db", "dbtable" -> "sales", "primaryKey" -> "id"),
      WriteMode.Upsert)
    val e = intercept[RuntimeException] {
      failing.write(Seq((1, "a")).toDF("id", "name"), cfg,
        RunContext(spark, "p", java.util.UUID.randomUUID().toString))
    }
    e.getMessage should include("constraint violation")
    recorded.last should startWith("DROP TABLE IF EXISTS sales_staging_")
  }

  test("kafka sink key/value projection: explicit columns vs whole-row JSON") {
    val df = Seq((7, "hello", 1.5)).toDF("id", "msg", "score")
    val explicit = KafkaSink.prepare(df,
      SinkConfig("kafka", Map("keyColumn" -> "id", "valueColumn" -> "msg")))
    explicit.columns shouldBe Array("key", "value")
    explicit.as[(String, String)].head() shouldBe (("7", "hello"))

    val wrapped = KafkaSink.prepare(df, SinkConfig("kafka", Map.empty))
    val (k, v) = wrapped.as[(String, String)].head()
    k shouldBe null
    v shouldBe """{"id":7,"msg":"hello","score":1.5}"""
  }
}
