package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions`-style registration: add
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the replay strategy is
  * available in every session without the API-side lazy registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => BboReplayStrategy)
  }
}
