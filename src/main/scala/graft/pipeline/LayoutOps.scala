package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Z-order (Morton) cell assignment for
  * multi-dimensional pruning.
  *
  * Why a training-data engine needs this: a 100 TB corpus is usually
  * laid out along ONE key (source, or ingest date). Every query that
  * filters on a second dimension (quality band, token-length band,
  * dedup shard) then scans everything. Interleaving the bits of two
  * range-bucketed dimensions into one `zcell` and partitioning/sorting
  * the files by it gives a layout where a 2-D box predicate touches
  * only the cells the box overlaps — O(box area) of the data instead of
  * O(corpus). This is the same mechanism Delta/Iceberg expose as
  * `OPTIMIZE ZORDER BY`; here it is a plain column + partitioned write,
  * and the probe side enumerates the covering cells driver-side (the
  * cell grid is 2^(2·bitsPer) entries — planning-time small) into an
  * `IN` list that lands in PartitionFilters (LayoutSpec asserts this).
  *
  * All arithmetic is exact integer math (`div`, bit shifts) so the
  * DuckDB oracle reproduces cells bit-for-bit; the min/max snapshot per
  * dimension is a 4-scalar planning-time aggregate, the same pattern as
  * the k-means centroid snapshots.
  */
object LayoutOps {

  /** Interleave the low `bitsPer` bits of two bucket columns: a→even
    * bit positions, b→odd. Bucket values MUST be in [0, 2^bitsPer) —
    * [[rangeBucket]] guarantees that by construction. The unrolled
    * shift/or chain stays inside whole-stage codegen and cannot
    * overflow (result < 2^(2·bitsPer) ≤ 2^32), so ANSI mode is safe. */
  def zValue(bucketA: Column, bucketB: Column, bitsPer: Int): Column = {
    require(bitsPer >= 1 && bitsPer <= 16,
      s"bitsPer must be in [1,16], got $bitsPer")
    (0 until bitsPer).map { i =>
      val aBit = shiftleft(shiftrightunsigned(bucketA, i).bitwiseAND(lit(1L)), 2 * i)
      val bBit = shiftleft(shiftrightunsigned(bucketB, i).bitwiseAND(lit(1L)), 2 * i + 1)
      aBit.bitwiseOR(bBit)
    }.reduce(_ bitwiseOR _)
  }

  /** Driver-side twin of [[zValue]] — used to enumerate probe cells. */
  def zValueOf(bucketA: Long, bucketB: Long, bitsPer: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bitsPer) {
      z |= ((bucketA >> i) & 1L) << (2 * i)
      z |= ((bucketB >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Exact equal-width range bucket of a long column into [0, cells):
    * ((v − vMin) · cells) div (vMax − vMin + 1). Integer `div` keeps it
    * bit-reproducible in DuckDB (`//`); no doubles anywhere. vMin/vMax
    * are literals snapshot from the data (or fixed by the caller for a
    * stable production layout — new data outside the snapshot range
    * would otherwise shift every bucket). */
  def rangeBucket(vExpr: String, vMin: Long, vMax: Long, cells: Int): Column = {
    require(cells >= 1 && vMax >= vMin,
      s"need cells >= 1 and vMax >= vMin, got cells=$cells [$vMin,$vMax]")
    val span = vMax - vMin + 1
    // SQL `div` is the exact integral division (Column has no such
    // operator; `/` would detour through doubles)
    expr(s"CAST(((($vExpr) - $vMin) * $cells) div $span AS BIGINT)")
  }

  /** Append `cell_a`, `cell_b`, `zcell` for two long dimensions of `df`,
    * bucketing each into 2^bitsPer equal-width cells over its observed
    * [min, max]. One planning-time scalar aggregate (4 values), then a
    * map-only projection. Write the result partitioned (or sorted) by
    * `zcell` to get the prunable layout. */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
                   bitsPer: Int): DataFrame = {
    val cells = 1 << bitsPer
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!mm.anyNull, s"zorderLayout: $colA/$colB have no non-null rows")
    val (aMin, aMax, bMin, bMax) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val bucketA = rangeBucket(colA, aMin, aMax, cells)
    val bucketB = rangeBucket(colB, bMin, bMax, cells)
    df.withColumn("cell_a", bucketA)
      .withColumn("cell_b", bucketB)
      .withColumn("zcell", zValue(col("cell_a"), col("cell_b"), bitsPer))
  }

  /** The covering z-cells of a 2-D bucket box — the probe side's `IN`
    * list. At most 2^(2·bitsPer) entries (bitsPer ≤ 16 enforced by
    * [[zValue]]), enumerated driver-side: cell ids are planning
    * constants exactly like partition values. */
  def zCellsForBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
                   bitsPer: Int): Seq[Long] = {
    require(bitsPer >= 1 && bitsPer <= 16,
      s"bitsPer must be in [1,16], got $bitsPer")
    val hi = (1L << bitsPer) - 1
    require(aLo >= 0 && bLo >= 0 && aHi <= hi && bHi <= hi,
      s"box [$aLo,$aHi]x[$bLo,$bHi] outside bucket domain [0,$hi]")
    for (a <- aLo to aHi; b <- bLo to bHi) yield zValueOf(a, b, bitsPer)
  }

  /** Persist `df` Z-ordered: layout cells computed over the two
    * dimensions' observed ranges, written PARTITIONED BY zcell, with the
    * bucketing metadata (mins/maxes/bitsPer) alongside so probes can
    * map value ranges to bucket ranges without re-scanning. The
    * dimension snapshot is taken ONCE at write time — a production
    * pipeline would pin the ranges explicitly so later appends land in
    * stable cells (see [[rangeBucket]]'s scaladoc). */
  def writeZordered(df: DataFrame, colA: String, colB: String,
                    bitsPer: Int, path: String): Unit = {
    val spark = df.sparkSession
    val laid = zorderLayout(df, colA, colB, bitsPer)
    laid.write.mode("overwrite").partitionBy("zcell").parquet(s"$path/data")
    val cells = 1 << bitsPer
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    import spark.implicits._
    Seq((colA, colB, bitsPer, cells,
        mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3)))
      .toDF("col_a", "col_b", "bits_per", "cells",
        "a_min", "a_max", "b_min", "b_max")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Probe a [[writeZordered]] layout with a 2-D VALUE box: maps the
    * value ranges to bucket ranges via the stored metadata, enumerates
    * the covering z-cells driver-side, and reads with a `zcell IN`
    * filter that lands in PartitionFilters — O(box area) of the data
    * scanned, not O(corpus). Values outside the written range clamp to
    * the edge buckets (they could only live there). */
  def readZorderBox(spark: org.apache.spark.sql.SparkSession, path: String,
                    aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    val (bitsPer, cells) = (m.getAs[Int]("bits_per"), m.getAs[Int]("cells"))
    val (aMin, aMax) = (m.getAs[Long]("a_min"), m.getAs[Long]("a_max"))
    val (bMin, bMax) = (m.getAs[Long]("b_min"), m.getAs[Long]("b_max"))
    def bucketOf(v: Long, lo: Long, hi: Long): Long = {
      val clamped = math.max(lo, math.min(hi, v))
      (clamped - lo) * cells / (hi - lo + 1)
    }
    val zcells = zCellsForBox(
      bucketOf(aLo, aMin, aMax), bucketOf(aHi, aMin, aMax),
      bucketOf(bLo, bMin, bMax), bucketOf(bHi, bMin, bMax), bitsPer)
    // the cell list prunes PARTITIONS; the residual value predicate
    // finishes the box exactly (cells are coarser than values)
    spark.read.parquet(s"$path/data")
      .filter(col("zcell").isin(zcells: _*))
      .filter(col(m.getAs[String]("col_a")).between(aLo, aHi) &&
        col(m.getAs[String]("col_b")).between(bLo, bHi))
  }

  /** DuckDB twin of bucket + interleave, for the oracle: integer `//`
    * division and an unrolled shift/or chain over disjoint bits. */
  def zValueSql(bucketAExpr: String, bucketBExpr: String, bitsPer: Int): String =
    (0 until bitsPer).flatMap { i =>
      Seq(s"(((($bucketAExpr) >> $i) & 1) << ${2 * i})",
        s"(((($bucketBExpr) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
}
