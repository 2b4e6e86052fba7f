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

  /** @param left      rows with a point column `timeCol`
    * @param right     rows with `startCol`/`endCol` interval bounds
    * @param keys      equi-join key columns present in both inputs
    * @param binWidth  bin size in time units; tune to the typical
    *                  interval length (fan-out = interval/width + 1)
    * @param maxFanOut intervals spanning more than this many bins (e.g.
    *                  an open-ended `end = Long.MaxValue` "still valid"
    *                  sentinel, which would otherwise hit Spark's
    *                  sequence-length cap or explode row counts) skip
    *                  binning and take a keys-only equi-join + exact
    *                  range filter instead. Correct for any interval;
    *                  concentrates work per key, which is fine exactly
    *                  because over-long intervals are rare per key
    *                  (typically the one open-ended current row).
    */
  def joinPointInInterval(left: DataFrame, right: DataFrame, timeCol: String,
                          startCol: String, endCol: String, keys: Seq[String],
                          binWidth: Long, maxFanOut: Long = 1024): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(maxFanOut >= 1, "maxFanOut must be >= 1")
    require(keys.nonEmpty, "range join requires at least one key column")
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(Set("__rj_bin"))
    require(clash.isEmpty, s"inputs already have reserved columns: $clash")
    val lBin = left.withColumn("__rj_bin", binOf(col(timeCol), binWidth))
    val rValid = right.filter(col(startCol).isNotNull && col(endCol).isNotNull &&
      col(startCol) < col(endCol))
    // Routing: binned path iff the interval LENGTH is under the cap.
    // Length is tested in double arithmetic, which cannot overflow at any
    // long magnitude (a sentinel start = Long.MinValue or end =
    // Long.MaxValue lands far above any sane cap regardless of rounding,
    // so the ±ulp imprecision near 2^63 can never misroute: only
    // intervals ~cap·width long are near the boundary, and those are
    // exactly representable). end-1 below is then overflow-safe for
    // binned rows because end - start is small. ONE canonical predicate
    // partitions every row into exactly one path.
    val shortIv = (col(endCol).cast("double") - col(startCol).cast("double")) <=
      lit(maxFanOut.toDouble * binWidth.toDouble)
    // end is exclusive: the last candidate bin is the one containing
    // end-1 (an interval touching a bin boundary must not leak into the
    // next bin)
    val rBins = rValid.filter(shortIv)
      .withColumn("__rj_bin", explode(sequence(
        binOf(col(startCol), binWidth), binOf(col(endCol) - 1, binWidth))))
    val binned = lBin.join(rBins, keys :+ "__rj_bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__rj_bin")
    val fallback = left.join(rValid.filter(!shortIv), keys)
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
    binned.unionByName(fallback)
  }

  /** Floor-division, overflow-free at ANY long (including sentinel
    * values within binWidth of Long.MinValue, where the pmod-subtraction
    * form would wrap): truncated integral `div`, stepped down by one
    * when truncation rounded toward zero on a negative value. */
  private def binOf(t: Column, w: Long): Column = {
    val tl = t.cast("long")
    val q = call_function("div", tl, lit(w))
    when(tl < 0 && q * w =!= tl, q - 1).otherwise(q)
  }
}
