package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each key's time-ordered events into
  * sessions separated by gaps larger than `maxGap`; each row gets its
  * session's start time as a deterministic, join-able session id.
  *
  * Plan shape: ONE shuffle + in-partition sort on the keys, two window
  * functions over the same frame (lag to mark session starts, running
  * last-non-null to propagate the start) — the same plan family as the
  * book replay and the as-of join, so the same bucketing story removes
  * the shuffle at scale. This is the batch analogue of Structured
  * Streaming's session windows (and the standard trick for event-log
  * sessionization in training-data pipelines).
  */
object Sessionize {

  /** @param maxGap largest in-session gap, in `timeCol` units; a row
    *               farther than this from its predecessor starts a new
    *               session. Null-time rows sort first and get a NULL
    *               session_start (they group into one per-key NULL
    *               session in the rollup) — filter them out if that is
    *               not the intended bucket. */
  def withSessionIds(df: DataFrame, timeCol: String, keys: Seq[String],
                     maxGap: Long, outCol: String = "session_start"): DataFrame = {
    require(keys.nonEmpty, "sessionize requires at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(w)
    val marker = when(prev.isNull || col(timeCol) - prev > maxGap, col(timeCol))
    df.withColumn("__sess_marker", marker)
      .withColumn(outCol,
        last(col("__sess_marker"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__sess_marker")
  }

  /** Per-session rollup: event count and time span per (keys, session). */
  def sessionStats(df: DataFrame, timeCol: String, keys: Seq[String],
                   maxGap: Long): DataFrame =
    withSessionIds(df, timeCol, keys, maxGap)
      .groupBy((keys.map(col) :+ col("session_start")): _*)
      .agg(count(lit(1)).as("n_events"),
        (max(col(timeCol)) - min(col(timeCol))).as("span"))
}
