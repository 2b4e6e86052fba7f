package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites — with a LIVENESS GUARD:
  * ~100 suites share one forked JVM, and a fatal error anywhere (heap
  * exhaustion in the DAGScheduler event loop stops the SparkContext)
  * used to cascade into every later suite failing with "Cannot call
  * methods on a stopped SparkContext" (the r18 driver gate's red
  * BarrierSpec was exactly this). Suites fetch the session through a
  * `lazy val spark = SparkTestSession.spark`, so re-checking liveness
  * here confines a killed context to the suite it died in: the next
  * suite's first access rebuilds the session. */
object SparkTestSession {
  @volatile private var current: SparkSession = _

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      // a stopped default session would otherwise be handed back by
      // getOrCreate on some code paths — clear both registries first
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = SparkSession.builder()
        .master("local[4]")
        .appName("graft-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      current.sparkContext.setLogLevel("WARN")
    }
    current
  }
}
