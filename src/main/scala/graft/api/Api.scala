package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.{SourceConfig, TransformConfig, SinkConfig}

/**
 * Component contracts — the Spark-first restatement of the reference's
 * DataExtractor / DataTransformer / DataLoader traits
 * (core/DataExtractor.scala:27, core/DataTransformer.scala:36-41,
 * core/DataLoader.scala:28-33). Everything consumes/produces a lazy
 * DataFrame; no action is ever triggered inside a component — the executor
 * decides when to materialize (via the write itself + observe()), so a
 * pipeline is exactly one Catalyst plan end to end.
 */
final case class RunContext(
    spark: SparkSession,
    pipelineId: String,
    runId: String,
    /** The executor's source registry, so transforms that read secondary
      * sources (register) see user-registered source types; None falls back
      * to the built-in registry. */
    sources: Option[Registry[Source]] = None,
    /** False when the run promises "nothing written, nothing evaluated"
      * (compose / --dry-run): transforms with optional eager behavior
      * (e.g. materialize's eager checkpoint) must stay lazy. This is the
      * executor's buildPlan sideEffects flag threaded to transforms — test
      * it, never the runId string. */
    sideEffects: Boolean = true)

final case class ValidationError(component: String, message: String)

class GraftException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
class ConfigException(msg: String) extends GraftException(msg)
class TransformException(msg: String, cause: Throwable = null) extends GraftException(msg, cause)
class ExtractException(msg: String, cause: Throwable = null) extends GraftException(msg, cause)
class LoadException(msg: String, cause: Throwable = null) extends GraftException(msg, cause)

trait Source {
  def sourceType: String
  /** Build a lazy DataFrame. MUST NOT trigger an action. */
  def read(config: SourceConfig)(implicit spark: SparkSession): DataFrame
  /** Fail-fast config validation (error accumulation, not first-error). */
  def validate(config: SourceConfig): List[String] = Nil
}

trait Transform {
  def transformType: String
  /** Compose more plan on top of `input`. MUST NOT trigger an action. */
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame
  def validate(config: TransformConfig, schema: org.apache.spark.sql.types.StructType): List[String] = Nil

  protected def required(config: TransformConfig, keys: String*): Unit = {
    val missing = keys.filterNot(config.options.contains)
    if (missing.nonEmpty)
      throw new ConfigException(
        s"${transformType} transform '${config.name}' missing required option(s): ${missing.mkString(", ")}")
  }

  /** Numeric option with a guided error (the one helper every operator
    * family used to re-implement): a typo'd `k: "lots"` fails as a
    * ConfigException naming the transform and the option, not a raw
    * NumberFormatException from deep inside the operator. */
  protected def intOption(config: TransformConfig, key: String,
                          default: => Int): Int =
    config.options.get(key).map { v =>
      try v.trim.toInt catch { case _: NumberFormatException =>
        throw new ConfigException(
          s"$transformType: $key must be an integer, got '$v'") }
    }.getOrElse(default)

  protected def longOption(config: TransformConfig, key: String,
                           default: => Long): Long =
    config.options.get(key).map { v =>
      try v.trim.toLong catch { case _: NumberFormatException =>
        throw new ConfigException(
          s"$transformType: $key must be an integer, got '$v'") }
    }.getOrElse(default)
}

final case class LoadResult(
    recordsWritten: Long,
    recordsFailed: Long = 0L,
    success: Boolean = true,
    errorMessage: Option[String] = None)

trait Sink {
  def sinkType: String
  /** Write `data`. The single action of a batch pipeline happens here; row
    * counts come from the write via `Observation`, never an extra count(). */
  def write(data: DataFrame, config: SinkConfig, ctx: RunContext): LoadResult
  def validate(config: SinkConfig): List[String] = Nil
}

/** Type-string → implementation registry (reference: pipeline/~Registry.scala),
  * with user extensibility via register(). */
final class Registry[T](kind: String, builtin: Map[String, T]) {
  @volatile private var entries: Map[String, T] = builtin
  def get(t: String): T = entries.getOrElse(
    t, throw new ConfigException(
      s"unknown $kind type '$t'; known: ${entries.keys.toList.sorted.mkString(", ")}"))
  def register(t: String, impl: T): Unit = synchronized { entries = entries + (t -> impl) }
  def list: List[String] = entries.keys.toList.sorted
}
