package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.api.{Sink, RunContext, LoadResult, ConfigException}
import graft.config.{SinkConfig, WriteMode, ExprUtils}

/**
 * Upsert SQL generation, separated from execution so it unit-tests without
 * drivers. Reference: loader/PostgresLoader.scala:141-185 (ON CONFLICT),
 * loader/MySQLLoader.scala:169-173 (ON DUPLICATE KEY UPDATE).
 *
 * Strategy (same as the reference, hardened): write the batch to a staging
 * table via parallel JDBC, then one transactional driver-side
 * INSERT…SELECT…ON CONFLICT — idempotent, so re-running a batch (or a
 * streaming epoch via foreachBatch) is exactly-once-ish on a keyed table.
 */
object UpsertSql {
  def postgres(table: String, staging: String, columns: Seq[String], keys: Seq[String]): String = {
    val cols = columns.mkString(", ")
    val updates = columns.filterNot(keys.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val action = if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    s"INSERT INTO $table ($cols) SELECT $cols FROM $staging " +
      s"ON CONFLICT (${keys.mkString(", ")}) $action"
  }
  def mysql(table: String, staging: String, columns: Seq[String], keys: Seq[String]): String = {
    val cols = columns.mkString(", ")
    val nonKey = columns.filterNot(keys.contains)
    // all-key tables: MySQL's syntax has no DO NOTHING, so emit a no-op
    // self-assignment on the first key (INSERT IGNORE would also swallow
    // unrelated errors, which we don't want)
    val updates =
      if (nonKey.isEmpty) { val k = keys.head; s"$k = VALUES($k)" }
      else nonKey.map(c => s"$c = VALUES($c)").mkString(", ")
    s"INSERT INTO $table ($cols) SELECT $cols FROM $staging " +
      s"ON DUPLICATE KEY UPDATE $updates"
  }
}

/** Seam for driver-side SQL so tests can intercept without a real database. */
trait SqlExecutor {
  def execute(url: String, props: java.util.Properties, statements: Seq[String]): Unit
}
object JdbcSqlExecutor extends SqlExecutor {
  def execute(url: String, props: java.util.Properties, statements: Seq[String]): Unit = {
    val conn: Connection = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try { statements.foreach(st.execute); conn.commit() }
      catch { case e: Throwable => conn.rollback(); throw e }
      finally st.close()
    } finally conn.close()
  }
}

/**
 * jdbc (postgres | mysql) sink — append/overwrite via Spark's parallel JDBC
 * writer (`batchsize` controls rows per round-trip, reference default 1000);
 * upsert via staging table + dialect SQL. Reference:
 * loader/PostgresLoader.scala:54-185, loader/MySQLLoader.scala:27-184.
 */
class JdbcSink(val sinkType: String, dialect: String,
               sqlExecutor: SqlExecutor = JdbcSqlExecutor) extends Sink {

  /** Parallel JDBC batch write — overridable seam so integration tests can
    * run the full append/overwrite/upsert flow without database drivers
    * (the same stand-in strategy as the reference's H2 tests). */
  protected def jdbcWrite(data: DataFrame, mode: SaveMode, url: String,
                          table: String, options: Map[String, String]): Unit =
    data.write.format("jdbc").mode(mode)
      .options(options).option("url", url).option("dbtable", table).save()

  def write(data: DataFrame, config: SinkConfig, ctx: RunContext): LoadResult = {
    val errs = validate(config)
    if (errs.nonEmpty) throw new ConfigException(errs.mkString("; "))
    val url = config.options("url")
    val table = config.options.getOrElse("dbtable", config.options("table"))
    val passthrough = (config.options -- Seq("url", "dbtable", "table", "primaryKey"))
      .updated("batchsize", config.options.getOrElse("batchsize", "1000"))

    SinkObserve(data, ctx) { observed =>
      config.writeMode match {
        case WriteMode.Append =>
          jdbcWrite(observed, SaveMode.Append, url, table, passthrough)
        case WriteMode.Overwrite =>
          jdbcWrite(observed, SaveMode.Overwrite, url, table, passthrough)
        case WriteMode.Upsert =>
          val keys = ExprUtils.parseColumns(config.options.getOrElse("primaryKey",
            throw new ConfigException(s"$sinkType sink: upsert requires 'primaryKey'")))
          val staging = s"${table}_staging_${ctx.runId.replace("-", "").take(12)}"
          // a batch with duplicate primary keys would make Postgres's
          // ON CONFLICT abort ("cannot affect row a second time") and
          // MySQL apply an insert-order-dependent (= nondeterministic
          // under parallel JDBC) last-write — collapse to one
          // DETERMINISTIC row per key first, ties broken by every other
          // column (the quality gate's survivor policy; non-orderable
          // tie-break columns key by their JSON form rather than failing
          // at analysis).
          import org.apache.spark.sql.functions.{col, row_number}
          val ordCols = (keys ++ observed.columns.filterNot(keys.contains))
            .map(ExprUtils.orderableOrJson(observed.schema, _))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*).orderBy(ordCols: _*)
          val deduped = observed.withColumn("__graft_rn", row_number().over(w))
            .filter(col("__graft_rn") === 1).drop("__graft_rn")
          jdbcWrite(deduped, SaveMode.Overwrite, url, staging, passthrough)
          val sql = dialect match {
            case "postgres" => UpsertSql.postgres(table, staging, data.columns.toSeq, keys)
            case "mysql"    => UpsertSql.mysql(table, staging, data.columns.toSeq, keys)
            case other      => throw new ConfigException(s"no upsert dialect for '$other'")
          }
          val props = new java.util.Properties()
          config.options.get("user").foreach(props.setProperty("user", _))
          config.options.get("password").foreach(props.setProperty("password", _))
          try sqlExecutor.execute(url, props, Seq(sql, s"DROP TABLE $staging"))
          catch { case e: Throwable =>
            // the merge transaction rolled back, but Spark's writer
            // committed the staging table on its own connections — drop
            // it so failed upserts don't accumulate full-batch copies
            try sqlExecutor.execute(url, props, Seq(s"DROP TABLE IF EXISTS $staging"))
            catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
            throw e
          }
      }
    }
  }

  override def validate(config: SinkConfig): List[String] = {
    val errs = List.newBuilder[String]
    if (!config.options.contains("url")) errs += s"$sinkType sink: missing 'url'"
    else if (!config.options("url").startsWith("jdbc:")) errs += s"$sinkType sink: url must start with jdbc:"
    if (!config.options.contains("dbtable") && !config.options.contains("table"))
      errs += s"$sinkType sink: missing 'dbtable'"
    if (config.writeMode == WriteMode.Upsert && !config.options.contains("primaryKey"))
      errs += s"$sinkType sink: upsert requires 'primaryKey'"
    errs.result()
  }
}
