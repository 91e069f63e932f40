package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{Transform, RunContext}
import graft.config.TransformConfig

/**
 * Single-pass numeric column profiling: one row per profiled column with
 * (n_values, n_nulls, n_distinct, min, max, avg, p50). The reference's
 * quality layer counts nulls per column but has no distributional stats
 * (`src/main/scala/com/etl/quality/DataQualityChecker.scala`); a real
 * curation pipeline profiles every ingest before filtering thresholds are
 * chosen, so this is a first-class quality operator here.
 *
 * Scale shape: ALL stats for ALL columns ride ONE aggregation over ONE scan
 * — map-side partial aggregation reduces each partition to a single row of
 * stat buffers before the 1-row exchange. Two knobs trade exactness for
 * boundedness at 100 TB:
 *
 *  - `exact=false` (default): `approx_count_distinct` (HLL++, fixed-size
 *    sketch) and `approx_percentile` (KLL-style, bounded buffer) — both
 *    mergeable partial aggregates, constant memory per executor at any
 *    data size.
 *  - `exact=true`: exact `count(DISTINCT)` (Catalyst Expand, still one
 *    scan) and exact interpolated `percentile` (per-value hash map —
 *    bounded by the column's CARDINALITY, not row count; fine for the
 *    bench/oracle, deliberate opt-in for petabyte corpora).
 *
 * The one-row frame is unpivoted to long format with `stack` — a driverless
 * projection over a 1-row DataFrame, not a second pass.
 */
object Profile {
  /** @param groupBy optional grouping keys: stats per (group, column) — the
    *                per-language / per-source ingest report. Same one-pass
    *                shape; the aggregation just keys on the groups. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false,
              groupBy: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = (cols ++ groupBy).filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile columns not in input: ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      val ndv = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      val p50 = if (exact) expr(s"percentile(cast(`$c` as double), 0.5)")
                else expr(s"approx_percentile(cast(`$c` as double), 0.5)")
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count_if(col(c).isNull).as(s"__nul_$c"),
        ndv.cast("long").as(s"__ndv_$c"),
        min(d).as(s"__min_$c"),
        max(d).as(s"__max_$c"),
        round(avg(d), 4).as(s"__avg_$c"),
        round(p50.cast("double"), 4).as(s"__p50_$c"))
    }
    val one =
      if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__cnt_$c`, `__nul_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`, `__avg_$c`, `__p50_$c`"
    }.mkString(", ")
    one.selectExpr(groupBy.map(g => s"`$g`") :+
      (s"stack(${cols.size}, $stackArgs) as " +
        "(column_name, n_values, n_nulls, n_distinct, min_value, max_value, avg_value, p50_value)"): _*)
  }
}

/**
 * Declarative profile step. Replaces the pipeline frame with the stats
 * frame (route it to its own sink, or `register` the main frame first if
 * both are needed downstream).
 *
 * {{{
 * - name: ingest-stats
 *   type: profile
 *   options: {columns: "l_quantity,l_extendedprice", exact: "false"}
 * }}}
 */
object ProfileTransform extends Transform {
  val transformType = "profile"
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "columns")
    val cols = config.options("columns").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val groups = config.options.get("groupBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    Profile.profile(input, cols,
      exact = config.options.get("exact").exists(_.toBoolean), groupBy = groups)
  }
}

/**
 * Declarative corpus TF-IDF (see [[graft.functions.TextFunctions.tfidf]]):
 * replaces the frame with one row per (doc, term) carrying tf/df/tfidf.
 *
 * {{{
 * - name: score-terms
 *   type: tfidf
 *   options: {idColumn: doc_id, textColumn: text}
 * }}}
 */
object TfidfTransform extends Transform {
  val transformType = "tfidf"
  def apply(input: DataFrame, config: TransformConfig, ctx: RunContext): DataFrame = {
    required(config, "idColumn", "textColumn")
    val id = config.options("idColumn"); val text = config.options("textColumn")
    config.options.getOrElse("scoring", "tfidf") match {
      case "tfidf" => graft.functions.TextFunctions.tfidf(input, id, text)
      case "bm25" => graft.functions.TextFunctions.bm25(input, id, text,
        k1 = config.options.get("k1").map(_.toDouble).getOrElse(1.2),
        b = config.options.get("b").map(_.toDouble).getOrElse(0.75))
      case other => throw new IllegalArgumentException(
        s"tfidf scoring must be tfidf|bm25, got '$other'")
    }
  }
}
