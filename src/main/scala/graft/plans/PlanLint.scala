package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Physical-plan lint: the 100 TB review a human does with
 * `.explain("formatted")`, mechanized. Walks the planned (pre-AQE)
 * physical tree and reports the anti-patterns that are survivable at
 * spec scale but fatal at cluster scale:
 *
 *  - **cartesian-product** (error): `CartesianProductExec` — an all-pairs
 *    join that shuffles BOTH sides; O(n·m) rows. Almost always a missing
 *    join key or a forgotten `broadcast()` on a small side.
 *  - **global-window** (error): `WindowExec` with an empty PARTITION BY —
 *    funnels the entire dataset through ONE task (the reason `assign_ids`
 *    and `shard` exist as distributed prefix sums instead of
 *    `row_number() OVER ()`).
 *  - **global-sort** (warn): a total ordering costs a full range exchange;
 *    legitimate when the output layout IS the product (zorder cluster,
 *    export order), accidental otherwise. (`orderBy().limit(k)` plans as
 *    TakeOrderedAndProject and is NOT flagged.)
 *  - **nested-loop-join** (warn): `BroadcastNestedLoopJoinExec` — fine
 *    when the broadcast side is a 1-row stats frame or a bounded query
 *    set (the engine's own crossJoin(broadcast(...)) shapes), quadratic
 *    when it is not. Worth eyeballing, not failing.
 *  - **udf** (warn): `ScalaUDF` in the plan breaks whole-stage codegen at
 *    that boundary and adds serialization per row. The engine's rule is
 *    "functions, not UDFs" — the one sanctioned exception is
 *    compression_ratio's Deflater.
 *  - **exact-percentile** (warn): a `percentile`/`median` AGGREGATE holds
 *    every distinct (value, count) pair of its group in the final
 *    reducer — the ONE aggregate whose state does not shrink with scale.
 *    Grouped over bounded-cardinality values it is survivable; GLOBAL
 *    (no grouping) over a 100 TB column it concentrates the column's
 *    distinct values in one buffer. The sketch spelling
 *    (`approx_percentile` / the KLL `quantile_sketch` transform /
 *    `quantile_filter`'s default) is the scale path — exact is for
 *    oracle-exactness and small frames (docs/SCALE.md).
 *  - **exchange-count** (info): number of shuffle exchanges — the
 *    quantity to minimize; one per declared wide operation is expected,
 *    more usually means a lost partitioning.
 *
 * Usage: `PlanLint.audit(df)` → findings; in YAML runs set
 * `spark.graft.planLint=warn|fail` (default `off`) and the executor
 * audits the final frame before the sink write — `fail` refuses to
 * launch a pipeline whose plan carries an error-severity finding.
 * `Main --dry-run` always appends the findings to its report.
 */
object PlanLint {

  final case class Finding(rule: String, severity: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  /** Audit the PREPARED physical tree — after EnsureRequirements has
    * inserted the exchanges (sparkPlan lacks them), unwrapping the AQE
    * shell to its initial plan (AQE may further improve it at runtime,
    * never worsen the lint verdict). Planning only; triggers no job. */
  def audit(df: DataFrame): Seq[Finding] = auditPlan(df.queryExecution.executedPlan)

  /** Depth-first visit of every node reachable from `p`, INCLUDING
    * subquery plans hanging off expressions (a cartesian product inside a
    * scalar/IN subquery is just as fatal) and the bodies of
    * AdaptiveSparkPlanExec shells at any depth (the AQE wrapper exposes no
    * children, so a plain `foreach` would stop at it). */
  private def visit(p: SparkPlan)(f: SparkPlan => Unit): Unit = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      visit(a.executedPlan)(f)
    case other =>
      f(other)
      other.subqueries.foreach(visit(_)(f))
      other.children.foreach(visit(_)(f))
  }

  private[plans] def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    var exchanges = 0
    val udfs = Seq.newBuilder[String]
    // exact percentiles: counted on FINAL/COMPLETE aggregate nodes only
    // (a partial+final pair is one logical aggregate, not two findings)
    var pctGlobal = 0; var pctGrouped = 0
    visit(plan) { node =>
      node match {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
          import org.apache.spark.sql.catalyst.expressions.aggregate._
          val exact = a.aggregateExpressions.count { ae =>
            (ae.mode == Final || ae.mode == Complete) &&
              ae.aggregateFunction.isInstanceOf[Percentile]
          }
          if (exact > 0) {
            if (a.groupingExpressions.isEmpty) pctGlobal += exact
            else pctGrouped += exact
          }
        case _ => ()
      }
      node match {
        case _: CartesianProductExec =>
          out += Finding("cartesian-product", "error",
            "all-pairs join shuffling both sides — missing join key or broadcast()")
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += Finding("global-window", "error",
            "window with empty PARTITION BY funnels the whole dataset through one task — " +
              "use a distributed prefix sum (assign_ids/shard) or add partition keys")
        case s: SortExec if s.global =>
          out += Finding("global-sort", "warn",
            "total ordering costs a full range exchange — intended for layout rewrites, " +
              "accidental elsewhere")
        case j: BroadcastNestedLoopJoinExec =>
          out += Finding("nested-loop-join", "warn",
            s"${j.joinType} nested-loop join (build ${j.buildSide}) — sound only while " +
              "the broadcast side stays tiny (stats frame / query set)")
        case _: ShuffleExchangeExec =>
          exchanges += 1
        case _ => ()
      }
      udfs ++= node.expressions.flatMap(_.collect {
        case u: ScalaUDF => u.udfName.getOrElse("anonymous")
      })
    }
    val udfList = udfs.result()
    if (udfList.nonEmpty)
      out += Finding("udf", "warn",
        s"${udfList.size} ScalaUDF call(s) (${udfList.distinct.mkString(", ")}) break " +
          "whole-stage codegen at their boundary — prefer native functions/expressions")
    if (pctGlobal + pctGrouped > 0)
      out += Finding("exact-percentile", "warn",
        s"${pctGlobal + pctGrouped} exact percentile/median aggregate(s)" +
          (if (pctGlobal > 0) s", $pctGlobal GLOBAL (ungrouped — the whole " +
            "column's distinct values concentrate in one final buffer)"
           else "") +
          " — state is O(distinct values) per group and does not shrink " +
          "with scale; prefer approx_percentile / quantile_sketch at " +
          "volume (docs/SCALE.md)")
    if (exchanges > 0)
      out += Finding("exchange-count", "info",
        s"$exchanges shuffle exchange(s) — expected: one per declared wide operation")
    out.result()
  }

  /** Errors only — the gate `planLint=fail` enforces. */
  def errors(df: DataFrame): Seq[Finding] = audit(df).filter(_.severity == "error")
}
