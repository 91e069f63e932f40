package graft.operators

import org.apache.spark.sql.DataFrame

import graft.api.{ConfigException, RunContext}

/** Shared resolver for persisted-store view options (`modelView`,
  * `targetModelView`, `langModelView`, …): one `spark.table` + guided
  * ConfigException instead of a hand-copied try/catch per transform —
  * the message/behavior can't drift between store consumers. */
private[graft] object Stores {
  def fromView(ctx: RunContext, view: String, option: String,
               tname: String, storeKind: String): DataFrame =
    try ctx.spark.table(view)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new ConfigException(
        s"$tname: $option '$view' is not a registered view/table — " +
          s"register the persisted $storeKind store first (${e.getMessage})")
    }
}
