package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{RunContext, Transform}
import graft.config.{ExprUtils, TransformConfig}

/**
 * resample — time-series regularization: bucket events into fixed
 * intervals, aggregate each bucket, and FILL THE GAPS so every key carries
 * a row for every interval between its first and last observation (the
 * prerequisite for rolling windows, lag-based deltas and charting, all of
 * which silently mis-align on missing buckets).
 *
 * {{{
 * - name: hourly-series
 *   type: resample
 *   options: {timeColumn: ts, interval: "6 hours", groupBy: user_id,
 *             aggregations: "n_events:count(*),sum_value:round(sum(value), 2)"}
 * }}}
 *
 * Missing buckets carry nulls for the aggregated columns (coalesce them
 * downstream with a `map` step if zeros are wanted). Output: groupBy keys,
 * `bucket_start`, aggregations.
 *
 * Scale shape: one hash aggregation on (keys, bucket) — map-side partials,
 * the only full-data shuffle; the per-key bounds frame and the exploded
 * grid are bucket-cardinality-sized, and the grid join co-partitions on
 * the same (keys, bucket) hash. The grid explode is bounded by
 * (max-min)/interval per key — a key observed over a year at 1-hour
 * resolution adds 8,760 rows, independent of event count.
 */
object ResampleTransform extends Transform {
  val transformType = "resample"
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "timeColumn", "interval", "aggregations")
    val ts = config.options("timeColumn")
    val interval = config.options("interval")
    val keys = config.options.get("groupBy").map(ExprUtils.parseColumns).getOrElse(Nil)
    val aggs = ExprUtils.parseAggregations(config.options("aggregations"))

    val bucketed = input
      .groupBy((keys.map(col) :+ window(col(ts), interval).getField("start")
        .as("bucket_start")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val bounds = (if (keys.isEmpty) bucketed.groupBy()
                  else bucketed.groupBy(keys.map(col): _*))
      .agg(min("bucket_start").as("__lo"), max("bucket_start").as("__hi"))
    val grid = bounds.select(keys.map(col) :+
      explode(expr(s"sequence(__lo, __hi, interval $interval)")).as("bucket_start"): _*)
    grid.join(bucketed, keys :+ "bucket_start", "left")
  }
}
