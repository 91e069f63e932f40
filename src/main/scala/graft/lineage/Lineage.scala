package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.config.{PipelineConfig, TransformConfig}

/**
 * Lineage metadata carried as an in-band `_lineage` JSON column.
 * Reference: core/LineageMetadata.scala:13-20, lineage/LineageTracker.scala.
 *
 * The reference re-reads the column per transformer with
 * `input.select("_lineage").first()` — a full Spark job per step
 * (AggregationTransformer.scala:143; SURVEY §3.4). The transformation chain
 * is known statically from the config, so we build it driver-side and stamp
 * the column ONCE with a constant `lit()` right before the sink: identical
 * observable output, zero extra jobs, and the constant folds in codegen.
 */
final case class LineageMetadata(
    sourceSystem: String,
    extractionTimestamp: Long,
    transformationChain: Seq[String],
    pipelineId: String,
    runId: String) {
  def toJson: String = {
    // JSON requires control characters (U+0000..U+001F) escaped: a multi-line YAML condition
    // flowing into a step label must not emit a raw newline that breaks
    // every downstream from_json/jq over _lineage
    def q(s: String) = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '\\' => b.append("\\\\")
        case '"'  => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case ch if ch < 0x20 => b.append(f"\\u${ch.toInt}%04x")
        case ch => b.append(ch)
      }
      b.append("\"").toString
    }
    s"""{"sourceSystem":${q(sourceSystem)},"extractionTimestamp":$extractionTimestamp,""" +
      s""""transformationChain":[${transformationChain.map(q).mkString(",")}],""" +
      s""""pipelineId":${q(pipelineId)},"runId":${q(runId)}}"""
  }
}

object Lineage {
  /** `aggregation(groupBy=category)`-style step labels, matching the
    * reference's chain entries (AggregationTransformer.scala:149).
    *
    * Multi-source merge (reference lineage/LineageTracker.scala:91-122
    * concatenates both sides' chains plus a `join(type)` step): the right
    * side of a join enters the pipeline via a `register` transform, whose
    * step records that side's SOURCE SYSTEM and location, and the `join`
    * step names the right dataset — so `_lineage` carries the full
    * provenance of every contributing source, in pipeline order. */
  def step(t: TransformConfig): String = {
    val detail = t.transformType match {
      case "aggregation" => t.options.get("groupBy").map(g => s"groupBy=$g").getOrElse("global")
      case "filter"      => t.options.getOrElse("condition", "")
      case "join"        => s"type=${t.options.getOrElse("joinType", "inner")}" +
        t.options.get("rightDataset").map(r => s", right=$r").getOrElse("")
      case "union"       => t.options.get("rightDataset").map(r => s"right=$r").getOrElse("")
      case "register"    =>
        val src = t.options.getOrElse("sourceType", "file")
        val loc = t.options.get("path").orElse(t.options.get("subscribe"))
          .orElse(t.options.get("dbtable")).map(l => s":$l").getOrElse("")
        s"source=$src$loc, view=${t.options.getOrElse("viewName", "")}"
      case "windowing"   => s"window=${t.options.getOrElse("windowDuration", t.options.getOrElse("gapDuration", ""))}"
      case _             => ""
    }
    if (detail.isEmpty) t.transformType else s"${t.transformType}($detail)"
  }

  def forPipeline(config: PipelineConfig, runId: String, extractionTs: Long): LineageMetadata =
    LineageMetadata(
      sourceSystem = config.source.sourceType,
      extractionTimestamp = extractionTs,
      transformationChain = config.transformations.map(step),
      pipelineId = config.pipelineId,
      runId = runId)

  def stamp(df: DataFrame, meta: LineageMetadata): DataFrame =
    df.withColumn("_lineage", lit(meta.toJson))
}
