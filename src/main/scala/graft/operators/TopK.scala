package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, functions => F}
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.{ExprUtils, TransformConfig}

/**
 * topk — the K best rows per group by a score column, via the bounded-heap
 * [[graft.ann.TopKAggregator]] rather than a ranking window.
 *
 * `window_rank` + `topK` computes the same result, but a window shuffles
 * EVERY row into |groups| reducer tasks and fully sorts each — with few
 * groups (languages, sources, priorities) that is a handful of tasks each
 * sorting the whole corpus. The aggregator form gets partial aggregation:
 * every map task reduces its partition to ≤ k candidates per group before
 * the exchange, so the shuffle carries |groups| × partitions × k ids, and
 * the tiny winner set broadcast-semi-joins back against the input (zero
 * full-data shuffles).
 *
 * Ties are deterministic: (score, id) is a total order — score
 * descending (or ascending with `direction: asc`), id ascending.
 * `idColumn` must be integral and unique.
 *
 * {{{
 * - name: best-docs-per-lang
 *   type: topk
 *   options: {groupBy: lang, scoreColumn: quality_score, k: "100",
 *             idColumn: doc_id}
 * }}}
 */
object TopKTransform extends Transform {
  val transformType = "topk"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      config.options.get("scoreColumn").toSeq ++ config.options.get("idColumn").toSeq ++
        config.options.get("groupBy").map(ExprUtils.parseColumns).getOrElse(Nil), "topk")
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "scoreColumn", "k", "idColumn")
    val k = config.options("k").toInt
    if (k <= 0) throw new ConfigException(s"topk: k must be positive, got $k")
    val idName = config.options("idColumn")
    val idType = input.schema(idName).dataType.typeName
    if (!Seq("long", "integer", "short", "byte").contains(idType))
      throw new ConfigException(
        s"topk: idColumn '$idName' must be integral and unique, got $idType")
    val groups = config.options.get("groupBy").map(ExprUtils.parseColumns).getOrElse(Nil)
    val rawScore = col(config.options("scoreColumn")).cast("double")
    val score = config.options.getOrElse("direction", "desc") match {
      case "desc" => rawScore
      case "asc"  => negate(rawScore)
      case other  => throw new ConfigException(
        s"topk: direction must be desc|asc, got '$other'")
    }
    BoundedTopK.semiJoinTopK(input, groups, score, idName, k)
  }
}

/**
 * The shared bounded-heap grouped-selection shape (used by `topk` and the
 * stratified `sample` mode): every map task reduces its partition to ≤ k
 * candidates per group before the exchange, the tiny winner-id set
 * broadcast-semi-joins back — zero full-data shuffles, never a per-group
 * window sort. Ordering is (score DESC, id ASC), a total order for unique
 * ids. Null scores, NaN scores (which would break the heap's strict-weak
 * ordering) and null ids are excluded up front.
 */
private[operators] object BoundedTopK {
  def semiJoinTopK(input: DataFrame, groupCols: Seq[String], score: org.apache.spark.sql.Column,
                   idName: String, k: Int): DataFrame = {
    val topk = F.udaf(new graft.ann.TopKAggregator(k),
      Encoders.product[graft.ann.ScoredCandidate])
    val scored = input.select(groupCols.map(col) ++ Seq(
      score.cast("double").as("__s"), col(idName).cast("long").as("__id")): _*)
      .where(col("__s").isNotNull && !isnan(col("__s")) && col("__id").isNotNull)
    val grouped = if (groupCols.isEmpty) scored.groupBy()
                  else scored.groupBy(groupCols.map(col): _*)
    val selected = grouped.agg(topk(col("__s"), col("__id")).as("tk"))
      .select(explode(col("tk.items")).as("s"))
      .select(col("s.id").as("__sel_id"))
    input.join(broadcast(selected), col(idName).cast("long") === col("__sel_id"), "left_semi")
  }
}
