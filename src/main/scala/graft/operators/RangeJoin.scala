package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match every left row at time `t` to the right
  * rows whose `[start, end)` interval contains `t`, within equal keys.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin — O(n·m)
  * per key and broadcast-bound. The scale path here is BINNING: pick a
  * bin width, explode each right interval to the bins it overlaps (cheap
  * when intervals are short relative to the width — the common case for
  * validity windows), compute each left row's single bin, then a plain
  * shuffled EQUI-join on (keys, bin) + an exact range filter. Each
  * (left, right) pair meets in exactly one bin (the left row's), so no
  * dedup is needed. Cost: one shuffle each side on (keys, bin);
  * per-partition hash join; interval fan-out = ceil(len/width)+1 rows.
  *
  * Semantics: inner join; half-open interval start <= t < end; null
  * times/bounds never match (SQL comparison semantics).
  */
object RangeJoin {

  /** @param left     rows with a point column `timeCol`
    * @param right    rows with `startCol`/`endCol` interval bounds
    * @param keys     equi-join key columns present in both inputs
    * @param binWidth bin size in time units; tune to the typical
    *                 interval length (fan-out = interval/width + 1)
    */
  def joinPointInInterval(left: DataFrame, right: DataFrame, timeCol: String,
                          startCol: String, endCol: String, keys: Seq[String],
                          binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(keys.nonEmpty, "range join requires at least one key column")
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(Set("__rj_bin"))
    require(clash.isEmpty, s"inputs already have reserved columns: $clash")
    val lBin = left.withColumn("__rj_bin", binOf(col(timeCol), binWidth))
    // end is exclusive: the last candidate bin is the one containing
    // end-1 (an interval touching a bin boundary must not leak into the
    // next bin)
    val rBins = right
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) < col(endCol))
      .withColumn("__rj_bin", explode(sequence(
        binOf(col(startCol), binWidth), binOf(col(endCol) - 1, binWidth))))
    lBin.join(rBins, keys :+ "__rj_bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__rj_bin")
  }

  /** Floor-division via pmod subtraction (exact for any sign; the final
    * double division is exact because the quotient is a bin INDEX —
    * < 2^53 for any conceivable time domain / width). */
  private def binOf(t: Column, w: Long): Column =
    ((t.cast("long") - pmod(t.cast("long"), lit(w))) / w).cast("long")
}
