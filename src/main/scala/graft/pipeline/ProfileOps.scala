package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "what is in this corpus?" pass that precedes
  * any pipeline design: per-column row/null/distinct counts and value
  * range, in ONE aggregation job.
  *
  * Scale shape: a single groupBy-less aggregate over the scan; the
  * exact distinct counts plan as one Expand + partial-aggregated
  * HashAggregate per column (Spark's standard multi-count-distinct
  * rewrite) — no per-column scans, no driver-side iteration. Min/max
  * are computed in each column's NATURAL order and stringified after
  * (casting first would compare "9" > "10" for numerics). Output is
  * melted to one row per column so downstream checks can join on the
  * column name. */
object ProfileOps {

  /** Profile `cols` of `df`: (column, n_rows, n_nonnull, n_distinct,
    * min_value, max_value) with the range endpoints as strings (a
    * profile spans heterogeneous column types; avoid double columns
    * where engine float formatting could differ). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val unknown = cols.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"columns not in the input: $unknown")
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val melted = explode(array(cols.map { c =>
      struct(lit(c).as("column"), col("__n_rows").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"))
    }: _*))
    one.select(melted.as("p")).select(col("p.*"))
  }
}
