package graft.api

import org.apache.spark.sql.DataFrame

/**
 * Central lineage-truncation seam for the engine's iterative and
 * multi-consumer frames ([[graft.dedup.Dedup.clusters]]' per-round labels,
 * the shared tf frame behind tfidf/BM25, the char-gram count frame).
 *
 * Mode comes from session conf, so it is settable from the Scala API
 * (`spark.conf.set`) and from a pipeline's `performance.checkpoint` block:
 *
 *  - `spark.graft.checkpoint = local` (default): `localCheckpoint` —
 *    executor block-manager storage, zero configuration, fastest. NOT
 *    recomputable on executor loss: an executor dying mid-job fails the
 *    job (Spark cannot rebuild the truncated lineage).
 *  - `spark.graft.checkpoint = reliable`: `checkpoint()` against
 *    `spark.graft.checkpoint.dir` (HDFS/object store on a real cluster) —
 *    survives executor loss, the right choice for a multi-hour 100 TB run
 *    where losing one of 1000 executors is routine, at the cost of a
 *    write+read through the checkpoint filesystem.
 */
object Checkpointing {
  val ModeKey = "spark.graft.checkpoint"
  val DirKey  = "spark.graft.checkpoint.dir"

  // the last DirKey value THIS seam applied: getCheckpointDir returns a
  // resolved URI (not the raw config string), so it can't be compared
  // against the conf to detect a per-pipeline dir change — without this,
  // pipeline B's spark.graft.checkpoint.dir was silently ignored because
  // pipeline A had already set A's dir on the shared SparkContext
  @volatile private var appliedDir: Option[String] = None

  /** [[checkpoint]] for MULTI-CONSUMER batch frames that may also flow
    * through a streaming pipeline: a no-op on streaming frames (where
    * localCheckpoint/checkpoint are unsupported and the consuming
    * operator's own streaming error is the guided one), the lazy shared
    * checkpoint otherwise. Use at the head of any transform that consumes
    * its input more than once — without truncation a composed pipeline
    * re-executes its whole upstream tower per consumer (measured on
    * q154's html_strip + quality stack: 2-3× the stage's own cost). */
  def shared(df: DataFrame): DataFrame =
    if (df.isStreaming) df else checkpoint(df, eager = false)

  /** Truncate `df`'s lineage under the session-configured mode.
    * `eager = false` defers materialization to first use (the lazy shared
    * tf frame); `eager = true` materializes now (per-round loop frames). */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        spark.conf.getOption(DirKey) match {
          case Some(d) if !appliedDir.contains(d) =>
            spark.sparkContext.setCheckpointDir(d)
            appliedDir = Some(d)
          case Some(_) => () // already applied this exact configured dir
          case None =>
            if (spark.sparkContext.getCheckpointDir.isEmpty)
              throw new ConfigException(
                s"$ModeKey=reliable needs $DirKey (or a pre-set " +
                  "SparkContext checkpoint dir)")
        }
        df.checkpoint(eager)
      case other => throw new ConfigException(
        s"$ModeKey must be local|reliable, got '$other'")
    }
  }
}
