package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{ConfigException, RunContext, Transform}
import graft.config.{ExprUtils, TransformConfig}

/**
 * scale — numeric feature normalization: z-score (`(x − μ) / σ`) or
 * min-max (`(x − min) / (max − min)`) per column, the standard prep before
 * distance-based models and quantization. Appends `<col>_scaled` columns.
 *
 * Scale shape: ONE aggregation computes every column's statistics
 * (map-side partials → a 1-row frame), which then rides a broadcast
 * cross-join into a pure projection — two narrow passes over the corpus,
 * zero wide shuffles, no driver-side data. Degenerate columns (σ = 0 or
 * max = min) scale to 0.0 rather than NaN.
 *
 * {{{
 * - name: normalize-features
 *   type: scale
 *   options: {columns: "quality_score,n_tokens", method: zscore}
 * }}}
 */
object ScaleTransform extends Transform {
  val transformType = "scale"
  override def validate(config: TransformConfig,
                        schema: org.apache.spark.sql.types.StructType): List[String] =
    Validate.columnsExist(schema,
      config.options.get("columns").map(ExprUtils.parseColumns).getOrElse(Nil), "scale")
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "columns")
    val cols = ExprUtils.parseColumns(config.options("columns"))
    val method = config.options.getOrElse("method", "zscore")
    val round2 = config.options.get("roundTo").map(_.toInt)
    def maybeRound(c: org.apache.spark.sql.Column) =
      round2.map(r => round(c, r)).getOrElse(c)
    val stats = method match {
      case "zscore" => cols.flatMap { c => Seq(
        avg(col(c)).as(s"__mu_$c"), stddev_samp(col(c)).as(s"__sd_$c")) }
      case "minmax" => cols.flatMap { c => Seq(
        min(col(c)).cast("double").as(s"__lo_$c"),
        max(col(c)).cast("double").as(s"__hi_$c")) }
      case other => throw new ConfigException(
        s"scale method must be zscore|minmax, got '$other'")
    }
    val one = input.agg(stats.head, stats.tail: _*)
    val joined = input.crossJoin(broadcast(one))
    val scaled = cols.foldLeft(joined) { (df, c) =>
      val x = col(c).cast("double")
      // null inputs stay null in the degenerate branch too (the normal
      // branch propagates null arithmetically; when() otherwise would not)
      val v = method match {
        case "zscore" =>
          when(x.isNull, lit(null).cast("double"))
            .when(col(s"__sd_$c").isNull || col(s"__sd_$c") === 0.0, 0.0)
            .otherwise((x - col(s"__mu_$c")) / col(s"__sd_$c"))
        case _ =>
          when(x.isNull, lit(null).cast("double"))
            .when(col(s"__hi_$c") === col(s"__lo_$c"), 0.0)
            .otherwise((x - col(s"__lo_$c")) / (col(s"__hi_$c") - col(s"__lo_$c")))
      }
      df.withColumn(s"${c}_scaled", maybeRound(v))
    }
    scaled.drop(one.columns: _*)
  }
}
