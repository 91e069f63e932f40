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
