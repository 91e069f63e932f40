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

  /** Truncate `df`'s lineage under the session-configured mode.
    * `eager = false` defers materialization to first use (the lazy shared
    * tf frame); `eager = true` materializes now (per-round loop frames). */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(
            spark.conf.getOption(DirKey).getOrElse(throw new ConfigException(
              s"$ModeKey=reliable needs $DirKey (or a pre-set SparkContext checkpoint dir)")))
        df.checkpoint(eager)
      case other => throw new ConfigException(
        s"$ModeKey must be local|reliable, got '$other'")
    }
  }
}
