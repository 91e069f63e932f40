package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.TransformConfig

/**
 * sessionize — declarative reach for [[Sessionize]]'s arbitrary-state
 * streaming sessionization: gap-break sessions per key, each emitted
 * exactly once when it closes (gap exceeded in-stream, or the watermark
 * passes last-event + gap). Wire it as a transform in a `micro-batch`
 * pipeline; the executor's `streaming.watermarkColumn/Delay` MUST cover
 * the `tsColumn` (EventTimeTimeout requires a watermark — Spark rejects
 * the query otherwise, at start, loudly).
 *
 * Output replaces the frame: (<keyColumn>, session_start, session_end,
 * n_events, total_value). State per key = one open session — bounded by
 * key cardinality, evicted on close; the scale property that lets this
 * run forever on an unbounded stream.
 *
 * {{{
 * executionMode: micro-batch
 * streaming: {watermarkColumn: ts, watermarkDelay: 10 minutes}
 * transformations:
 *   - name: user-sessions
 *     type: sessionize
 *     options: {keyColumn: user_id, tsColumn: ts, valueColumn: value,
 *               gap: "30 minutes"}
 * }}}
 */
object SessionizeTransform extends Transform {
  val transformType = "sessionize"

  private val durationRe =
    "^(\\d+)\\s*(ms|milliseconds?|s|sec|seconds?|m|min|minutes?|h|hours?)$".r
  private[graft] def durationMs(s: String): Long = s.trim.toLowerCase match {
    case durationRe(n, u) => n.toLong * (u.head match {
      case 'h'            => 3600000L
      case 'm' if u != "ms" && !u.startsWith("mill") => 60000L
      case 's'            => 1000L
      case _              => 1L // ms / millisecond(s)
    })
    case other => throw new ConfigException(
      s"sessionize: gap must be '<n> <ms|seconds|minutes|hours>', got '$other'")
  }

  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "keyColumn", "tsColumn", "gap")
    val keyName = config.options("keyColumn")
    val gapMs = durationMs(config.options("gap"))
    if (gapMs <= 0) throw new ConfigException("sessionize: gap must be positive")
    import input.sparkSession.implicits._
    val tsName = config.options("tsColumn")
    // do NOT re-cast an already-timestamp column: the cast mints a new
    // attribute WITHOUT the watermark metadata the executor attached, and
    // EventTimeTimeout then rejects the query as unwatermarked
    val tsCol = input.schema(tsName).dataType match {
      case org.apache.spark.sql.types.TimestampType => col(tsName)
      case _ => col(tsName).cast("timestamp")
    }
    val events = input.select(
      col(keyName).cast("long").as("user_id"),
      tsCol.as("ts"),
      config.options.get("valueColumn").map(col(_).cast("double"))
        .getOrElse(org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Sessionize.Event]
    Sessionize.sessions(events, gapMs).toDF()
      .withColumnRenamed("user_id", keyName)
  }
}
