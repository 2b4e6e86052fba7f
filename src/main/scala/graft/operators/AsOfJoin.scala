package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join: for every left row, the latest right row at
  * or before (backward) / earliest at or after (forward) the left row's
  * time, within the same keys — the canonical market-data enrichment
  * (trade ← prevailing quote).
  *
  * Spark has no native as-of join; the scalable composition is
  * union-tag + running last-non-null window:
  *
  *  - tag left and right rows, union them, shuffle ONCE on the join keys,
  *    sort within partitions by (time, tag) with right-before-left at
  *    equal times (time descending for the forward direction);
  *  - a running `last(payload, ignoreNulls)` window carries each right
  *    row's payload to every in-scope left row — the payload travels as
  *    ONE nullable struct so the matched time and every value column
  *    always come from the same right row, even when individual right
  *    values are null;
  *  - keep the left rows.
  *
  * This is O(n log n) in the partition (the sort), with no per-row point
  * lookups or range joins. The cost at scale is ONE exchange of
  * left+right on the keys feeding one in-partition sort — the replay
  * plan's shape. (Unlike the single-input replay/sessionize windows,
  * bucketed INPUTS cannot elide this exchange: the union node reports
  * unknown partitioning to Spark even when both sides are co-bucketed —
  * what bucketing buys here is only the cheap scan; the window's
  * exchange stays.) An optional `tolerance` nulls out matches farther
  * than `tolerance` ticks away.
  *
  * SQL equi-join semantics: null keys never match; a null right time
  * never matches (the comparison would be NULL) — both are filtered from
  * the right side, so left rows keyed to them get a null match.
  */
object AsOfJoin {

  /** Backward as-of join: latest right row with rightTime <= leftTime.
    *
    * @param left      driving rows (kept 1:1 in the output)
    * @param right     quotes side; must contain keys ++ timeCol ++ valueCols
    * @param timeCol   ordering column name, present in both inputs
    * @param keys      equi-join key column names, present in both inputs
    * @param valueCols right-side payload columns to carry onto left rows
    * @param tolerance max allowed (leftTime − rightTime); None = unbounded
    */
  def joinAsOfBackward(left: DataFrame, right: DataFrame, timeCol: String,
                       keys: Seq[String], valueCols: Seq[String],
                       tolerance: Option[Long] = None): DataFrame =
    joinAsOf(left, right, timeCol, keys, valueCols, tolerance, forward = false)

  /** Forward as-of join: earliest right row with rightTime >= leftTime. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, timeCol: String,
                      keys: Seq[String], valueCols: Seq[String],
                      tolerance: Option[Long] = None): DataFrame =
    joinAsOf(left, right, timeCol, keys, valueCols, tolerance, forward = true)

  /** Nearest as-of join: the right row minimizing |rightTime − leftTime|;
    * exact ties prefer the backward (earlier-or-equal) match. Same plan
    * as the directional forms — ONE shuffle + sort — with two window
    * frames over the same sort: a running last (nearest backward
    * candidate) and a strictly-after first (nearest forward candidate),
    * then a row-local pick. `tolerance` bounds the absolute distance and
    * is applied BEFORE the pick (merge_asof convention): the match is the
    * nearest among in-tolerance candidates, so a left row whose nearest
    * side is out of tolerance still takes the other side when that one is
    * within. */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, timeCol: String,
                      keys: Seq[String], valueCols: Seq[String],
                      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftCols) = unionTagged(left, right, timeCol, keys, valueCols)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc_nulls_first, col("__tag").asc)
    // same-time right rows sort BEFORE the left row, so they are in the
    // backward frame; the forward frame starts strictly after the
    // current row and only sees strictly-later right rows
    val carried = unioned
      .withColumn("__back", last(col("__rpack"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__fwd", first(col("__rpack"), ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))
    val t = col(timeCol).cast("long")
    val backDist = t - col("__back.__rt")
    val fwdDist = col("__fwd.__rt") - t
    // tolerance gates each CANDIDATE, not the already-picked winner —
    // otherwise a left row whose nearer side is out of tolerance would
    // get null instead of the in-tolerance farther side
    val (backOk, fwdOk) = tolerance match {
      case Some(tol) =>
        (col("__back").isNotNull && backDist <= tol,
          col("__fwd").isNotNull && fwdDist <= tol)
      case None => (col("__back").isNotNull, col("__fwd").isNotNull)
    }
    val chosen =
      when(col(timeCol).isNull, lit(null))
        .when(backOk && fwdOk,
          when(backDist <= fwdDist, col("__back")).otherwise(col("__fwd")))
        .when(backOk, col("__back"))
        .when(fwdOk, col("__fwd"))
        .otherwise(lit(null))
    val withChoice = carried.withColumn("__asof", chosen)
    withChoice.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(c)) :+
        col("__asof.__rt").as(s"asof_$timeCol"): _*)
  }

  /** Shared union-tag construction: left rows tagged 1, right rows
    * tagged 0 with their payload packed into ONE nullable struct
    * (`__rpack`) so every carried value comes from the same right row. */
  private def unionTagged(left: DataFrame, right: DataFrame, timeCol: String,
                          keys: Seq[String], valueCols: Seq[String])
      : (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val reserved = valueCols.toSet ++
      Set(s"asof_$timeCol", "__rpack", "__tag", "__asof", "__back", "__fwd")
    val clash = left.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"left already has reserved/output columns: $clash")

    val rightNonNull = (keys :+ timeCol)
      .foldLeft(right)((d, k) => d.filter(col(k).isNotNull))

    val leftCols = left.columns.toSeq
    val packed = struct(
      (col(timeCol).cast("long").as("__rt") +: valueCols.map(c => col(c).as(c))): _*)
    val lAligned = left
      .withColumn("__rpack", lit(null).cast(
        right.select(packed.as("__rpack")).schema("__rpack").dataType))
      .withColumn("__tag", lit(1))
    val rAligned = rightNonNull
      .select((keys :+ timeCol).map(col) :+ packed.as("__rpack"): _*)
      .withColumn("__tag", lit(0))
    val rFull = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(rAligned) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = lAligned.unionByName(rFull.select(lAligned.columns.toIndexedSeq.map(col): _*))
    (unioned, leftCols)
  }

  private def joinAsOf(left: DataFrame, right: DataFrame, timeCol: String,
                       keys: Seq[String], valueCols: Seq[String],
                       tolerance: Option[Long], forward: Boolean): DataFrame = {
    val (unioned, leftCols) = unionTagged(left, right, timeCol, keys, valueCols)

    // right rows sort before left rows at equal time (ties match).
    // Nulls sort FIRST in both directions: a left row with a null time
    // precedes every right row in the window, so the running last() sees
    // no right payload and the match is null — consistent across
    // directions and with SQL comparison semantics (NULL time matches
    // nothing; DuckDB ASOF behaves the same). The default desc ordering
    // is nulls-LAST, which would hand null-time left rows the earliest
    // quote in the forward direction.
    val timeOrder =
      if (forward) col(timeCol).desc_nulls_first else col(timeCol).asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__rpack"), ignoreNulls = true).over(w))

    val age =
      if (forward) col("__asof.__rt") - col(timeCol).cast("long")
      else col(timeCol).cast("long") - col("__asof.__rt")
    val inTol = tolerance match {
      case Some(t) => col("__asof").isNotNull && age <= t
      case None => col("__asof").isNotNull
    }
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => when(inTol, col(s"__asof.$c")).otherwise(lit(null)).as(c)) :+
        when(inTol, col("__asof.__rt")).otherwise(lit(null)).as(s"asof_$timeCol"): _*)
  }
}
