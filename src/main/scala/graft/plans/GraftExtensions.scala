package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions`-style registration: add
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the whole engine surface —
  * the replay planner strategy AND the SQL functions (`bbo_from_price_*`,
  * `long_array_dot`) — is available in every session with no API-side
  * lazy registration. This is the deployment path for a shared cluster:
  * one conf line, no code changes in user jobs. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => BboReplayStrategy)
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
  }
}
