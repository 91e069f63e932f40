package graft.config

/**
 * Unified pipeline-config model ("dialect C" of the reference — the one its
 * tests, shipped YAMLs, and docs/CONFIGURATION.md agree on), with dialect A's
 * `executionMode` kept as an optional field.
 *
 * Reference shape: src/test/scala/com/etl/benchmark/BatchPerformanceSpec.scala:88-128,
 * docs/CONFIGURATION.md and the shipped pipeline YAMLs. Re-expressed as a plain Scala ADT;
 * the pipeline itself is declarative — it only ever composes a Spark
 * LogicalPlan, never executes driver-side loops.
 */
sealed trait ExecutionMode
object ExecutionMode {
  case object Batch extends ExecutionMode
  case object MicroBatch extends ExecutionMode
  def parse(s: String): ExecutionMode = s.trim.toLowerCase match {
    case "batch"                       => Batch
    case "micro-batch" | "microbatch" | "streaming" => MicroBatch
    case other => throw new IllegalArgumentException(s"unknown executionMode: $other")
  }
}

sealed trait WriteMode
object WriteMode {
  case object Append    extends WriteMode
  case object Overwrite extends WriteMode
  case object Upsert    extends WriteMode
  def parse(s: String): WriteMode = s.trim.toLowerCase match {
    case "append"    => Append
    case "overwrite" => Overwrite
    case "upsert"    => Upsert
    case other => throw new IllegalArgumentException(s"unknown writeMode: $other")
  }
}

final case class SourceConfig(
    sourceType: String,
    options: Map[String, String] = Map.empty,
    schemaPath: Option[String] = None)

final case class TransformConfig(
    name: String,
    transformType: String,
    options: Map[String, String] = Map.empty)

final case class SinkConfig(
    sinkType: String,
    options: Map[String, String] = Map.empty,
    writeMode: WriteMode = WriteMode.Append,
    partitionBy: List[String] = Nil)

/** Per-column null-check action (docs/CONFIGURATION.md:452-461: fail | quarantine). */
sealed trait NullAction
object NullAction {
  case object Fail       extends NullAction
  case object Quarantine extends NullAction
  def parse(s: String): NullAction = s.trim.toLowerCase match {
    case "fail"       => Fail
    case "quarantine" => Quarantine
    case other => throw new IllegalArgumentException(s"unknown null-check action: $other")
  }
}
final case class NullCheck(column: String, action: NullAction = NullAction.Quarantine)
final case class DuplicateCheck(columns: List[String] = Nil, action: NullAction = NullAction.Quarantine)

final case class QualityConfig(
    schemaValidation: Boolean = false,
    nullChecks: List[NullCheck] = Nil,
    duplicateCheck: Option[DuplicateCheck] = None,
    quarantinePath: Option[String] = None)

/** Tuning knobs the reference documents but never wires (SURVEY §4) — we wire them. */
final case class PerformanceConfig(
    repartition: Option[Int] = None,
    cacheIntermediate: Boolean = false,
    shufflePartitions: Option[Int] = None,
    // lineage-truncation mode for iterative/shared frames (clusters, tfidf):
    // "local" (default, localCheckpoint) or "reliable" (checkpoint() to
    // checkpointDir — survives executor loss on long cluster jobs)
    checkpoint: Option[String] = None,
    checkpointDir: Option[String] = None,
    // plan-lint mode for this pipeline: "off" | "warn" | "fail"
    // (sets spark.graft.planLint; see graft.plans.PlanLint)
    planLint: Option[String] = None)

final case class StreamingConfig(
    checkpointLocation: Option[String] = None,
    watermarkColumn: Option[String] = None,
    watermarkDelay: Option[String] = None,
    trigger: Option[String] = None, // "availableNow" | "processingTime=5 seconds"
    outputMode: String = "append",
    // Streaming deduplication keys (comma list): with a watermark
    // configured, state for seen keys is dropped once it ages past the
    // delay (dropDuplicatesWithinWatermark) — bounded state on an
    // unbounded stream; without one, plain dropDuplicates (state grows
    // with distinct keys — only for bounded backfills).
    dedupColumns: Option[String] = None,
    // State-store backend for stateful operators: "hdfs" (default —
    // Spark's in-heap HDFSBackedStateStoreProvider), "rocksdb" (the
    // off-heap RocksDBStateStoreProvider — the large-state choice:
    // sessionization / stream-stream joins whose state exceeds executor
    // heap), or a fully-qualified provider class. Session-level by
    // necessity (Spark pins it at query planning); the checkpoint
    // recovery contract is identical across providers (spec-proven).
    stateStoreProvider: Option[String] = None,
    // Stateful-operator partition count for THIS query (sets the session's
    // shuffle partitions before start; sticky for the query's lifetime via
    // the offset log). Size to key cardinality: a stream with thousands of
    // distinct windows/keys wants far fewer state stores than a 100 TB
    // batch shuffle wants partitions — each state partition pays per-batch
    // open/commit/snapshot overhead regardless of how little state it holds.
    shufflePartitions: Option[Int] = None)

final case class PipelineConfig(
    pipelineId: String,
    name: String = "",
    source: SourceConfig,
    transformations: List[TransformConfig] = Nil,
    sink: SinkConfig,
    executionMode: ExecutionMode = ExecutionMode.Batch,
    quality: Option[QualityConfig] = None,
    performance: Option[PerformanceConfig] = None,
    streaming: Option[StreamingConfig] = None)
