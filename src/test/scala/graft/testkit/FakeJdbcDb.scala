package graft.testkit

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sinks.JdbcSink

/**
 * Parquet-files-as-tables JDBC stand-in (the reference's H2 strategy,
 * FR-029: no real services in tests). Records driver-side SQL and replays
 * the generated postgres upsert against the parquet "tables" so upsert
 * semantics and idempotency are actually observable.
 */
final class FakeJdbcDb(spark: SparkSession, dir: String) {
  val executed: mutable.Buffer[String] = mutable.Buffer[String]()
  def tablePath(t: String): String = s"$dir/$t"
  def read(t: String): DataFrame = spark.read.parquet(tablePath(t))

  val sink: JdbcSink = new JdbcSink("postgres", "postgres", (_, _, statements) => {
    executed ++= statements
    statements.foreach {
      case sql if sql.startsWith("INSERT INTO ") =>
        val Target = """INSERT INTO (\w+) .* FROM (\w+) ON CONFLICT \((\w+)\).*""".r
        sql match {
          case Target(target, staging, key) =>
            val merged = read(target).join(read(staging), Seq(key), "left_anti")
              .unionByName(read(staging))
            val tmp = s"$dir/__merge"
            merged.write.mode(SaveMode.Overwrite).parquet(tmp)
            spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(tablePath(target))
          case _ => throw new IllegalStateException(s"unexpected upsert SQL shape: $sql")
        }
      case sql if sql.startsWith("DROP TABLE ") => // staging cleanup, no-op on files
      case sql => throw new IllegalStateException(s"unexpected SQL: $sql")
    }
  }) {
    override protected def jdbcWrite(data: DataFrame, mode: SaveMode, url: String,
                                     table: String, options: Map[String, String]): Unit =
      data.write.mode(mode).parquet(tablePath(table))
  }
}
