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
    * would otherwise shift every bucket).
    *
    * Overflow-safe on wide spans: when (span−1)·cells could exceed
    * int64 — an epoch-microseconds dimension (span ~1.7e18) already
    * does at 16 cells — the arithmetic widens through DECIMAL(38,0)
    * (same exact integer math, matching DuckDB's automatic 128-bit
    * promotion); narrow spans keep the pure-long fast path. The choice
    * is made per-literal at planning time, so the hot map stays
    * codegen'd either way. */
  def rangeBucket(vExpr: String, vMin: Long, vMax: Long, cells: Int): Column = {
    require(cells >= 1 && vMax >= vMin,
      s"need cells >= 1 and vMax >= vMin, got cells=$cells [$vMin,$vMax]")
    val span = BigInt(vMax) - BigInt(vMin) + 1
    // SQL `div` is the exact integral division (Column has no such
    // operator; `/` would detour through doubles)
    if ((span - 1) * cells <= Long.MaxValue)
      expr(s"CAST(((($vExpr) - $vMin) * $cells) div $span AS BIGINT)")
    else
      expr(s"CAST(((CAST(($vExpr) AS DECIMAL(38,0)) - $vMin) * $cells)" +
        s" div CAST('$span' AS DECIMAL(38,0)) AS BIGINT)")
  }

  /** Driver-side twin of [[rangeBucket]] with the probe clamp: values
    * outside [vMin, vMax] map to the edge buckets (they could only live
    * there). BigInt throughout — the driver runs this once per probe,
    * and a wide-span dimension overflows int64 exactly like the column
    * form would. */
  def bucketOf(v: Long, vMin: Long, vMax: Long, cells: Int): Long = {
    require(cells >= 1 && vMax >= vMin,
      s"need cells >= 1 and vMax >= vMin, got cells=$cells [$vMin,$vMax]")
    val clamped = math.max(vMin, math.min(vMax, v))
    ((BigInt(clamped) - vMin) * cells / (BigInt(vMax) - BigInt(vMin) + 1)).toLong
  }

  /** Append `cell_a`, `cell_b`, `zcell` for two long dimensions of `df`,
    * bucketing each into 2^bitsPer equal-width cells over its observed
    * [min, max]. One planning-time scalar aggregate (4 values), then a
    * map-only projection. Write the result partitioned (or sorted) by
    * `zcell` to get the prunable layout. */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
                   bitsPer: Int): DataFrame = {
    val (aMin, aMax, bMin, bMax) = snapshotRanges(df, colA, colB)
    zorderLayoutPinned(df, colA, colB, bitsPer,
      aMin, aMax, bMin, bMax, clamp = false)
  }

  /** The 4-scalar planning-time min/max snapshot behind the un-pinned
    * layout paths — computed ONCE and threaded through, never
    * re-scanned (a second scan could observe different data and
    * silently diverge metadata from the written buckets). */
  private def snapshotRanges(df: DataFrame, colA: String, colB: String)
      : (Long, Long, Long, Long) = {
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!mm.anyNull, s"zorderLayout: $colA/$colB have no non-null rows")
    (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
  }

  /** [[zorderLayout]] with caller-fixed dimension ranges — the stable
    * production layout: appends bucket against the SAME ranges as the
    * original write, so they land in the same cells. With
    * `clamp = true`, values outside the pinned range go to the edge
    * buckets (where a probe's clamped box would look for them) instead
    * of producing out-of-domain cells; the un-pinned path skips the
    * clamp since observed min/max make it a no-op. */
  def zorderLayoutPinned(df: DataFrame, colA: String, colB: String,
                         bitsPer: Int, aMin: Long, aMax: Long,
                         bMin: Long, bMax: Long,
                         clamp: Boolean = true): DataFrame = {
    val cells = 1 << bitsPer
    def clamped(c: String, lo: Long, hi: Long): String =
      if (clamp) s"LEAST(GREATEST(($c), $lo), $hi)" else c
    df.withColumn("cell_a",
        rangeBucket(clamped(colA, aMin, aMax), aMin, aMax, cells))
      .withColumn("cell_b",
        rangeBucket(clamped(colB, bMin, bMax), bMin, bMax, cells))
      .withColumn("zcell", zValue(col("cell_a"), col("cell_b"), bitsPer))
  }

  /** Hard cap on driver-side cell enumeration: beyond this the `IN`
    * list would not plan well anyway (and at bitsPer=16 an unbounded
    * box could enumerate 2^32 longs — a driver OOM). A probe wider
    * than the cap should use a plain range scan instead. */
  val MaxProbeCells: Long = 1L << 16

  /** The covering z-cells of a 2-D bucket box — the probe side's `IN`
    * list, enumerated driver-side: cell ids are planning constants
    * exactly like partition values. Box area is capped at
    * [[MaxProbeCells]] — loudly, like the rest of the contract guards —
    * because the enumeration materializes one long per cell on the
    * driver. */
  def zCellsForBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
                   bitsPer: Int): Seq[Long] = {
    require(bitsPer >= 1 && bitsPer <= 16,
      s"bitsPer must be in [1,16], got $bitsPer")
    val hi = (1L << bitsPer) - 1
    require(aLo >= 0 && bLo >= 0 && aHi <= hi && bHi <= hi,
      s"box [$aLo,$aHi]x[$bLo,$bHi] outside bucket domain [0,$hi]")
    val area = (aHi - aLo + 1) * (bHi - bLo + 1)
    require(area <= MaxProbeCells,
      s"box [$aLo,$aHi]x[$bLo,$bHi] covers $area cells > $MaxProbeCells; " +
        "a probe this wide should scan by range, not enumerate cells")
    for (a <- aLo to aHi; b <- bLo to bHi) yield zValueOf(a, b, bitsPer)
  }

  /** Persist `df` Z-ordered: layout cells computed over the two
    * dimensions' ranges, written PARTITIONED BY zcell, with the
    * bucketing metadata (mins/maxes/bitsPer, and whether the ranges
    * were pinned) alongside so probes can map value ranges to bucket
    * ranges without re-scanning.
    *
    * `ranges = None` snapshots observed min/max ONCE and threads the
    * same 4 scalars into both the bucket computation and the metadata
    * (two independent scans could observe different data and silently
    * desynchronize them). `ranges = Some((aMin, aMax, bMin, bMax))`
    * pins the bucket domain — the stable production layout: later
    * `append = true` writes with the SAME pinned ranges land in the
    * same cells, and out-of-range values clamp to edge buckets (where
    * a probe's clamped box looks for them). Appending without pinned
    * ranges is refused loudly: a fresh snapshot would re-bucket only
    * the new batch and corrupt the layout. */
  def writeZordered(df: DataFrame, colA: String, colB: String,
                    bitsPer: Int, path: String,
                    ranges: Option[(Long, Long, Long, Long)] = None,
                    append: Boolean = false): Unit = {
    val spark = df.sparkSession
    val (aMin, aMax, bMin, bMax, pinned) = ranges match {
      case Some((a1, a2, b1, b2)) =>
        require(a2 >= a1 && b2 >= b1,
          s"pinned ranges must be non-empty, got [$a1,$a2]x[$b1,$b2]")
        (a1, a2, b1, b2, true)
      case None =>
        require(!append,
          "append requires pinned ranges: a fresh min/max snapshot would " +
            "bucket the new batch against a different domain than the " +
            "existing layout")
        val (a1, a2, b1, b2) = snapshotRanges(df, colA, colB)
        (a1, a2, b1, b2, false)
    }
    if (append) {
      // an append bucketing against a DIFFERENT domain than the existing
      // layout would silently corrupt it (and rewrite meta to match the
      // new batch only) — refuse unless the stored metadata agrees
      val m = spark.read.parquet(s"$path/meta").head()
      val stored = (m.getAs[String]("col_a"), m.getAs[String]("col_b"),
        m.getAs[Int]("bits_per"), m.getAs[Long]("a_min"), m.getAs[Long]("a_max"),
        m.getAs[Long]("b_min"), m.getAs[Long]("b_max"))
      val asked = (colA, colB, bitsPer, aMin, aMax, bMin, bMax)
      require(stored == asked,
        s"append layout mismatch: index at $path was written with $stored, " +
          s"append asked for $asked — appends must reuse the stored geometry")
    }
    val laid = zorderLayoutPinned(df, colA, colB, bitsPer,
      aMin, aMax, bMin, bMax, clamp = pinned)
    // repartition by zcell before the partitioned write: otherwise every
    // task writes one small file per cell it holds — tasks × cells tiny
    // files, and every probe pays the per-file open cost (the serve-soak
    // measured 32× the file count without this). One extra linear
    // shuffle on a write-once artifact; a 100 TB layout would add a salt
    // column to split cells hotter than a target file size.
    laid.repartition(col("zcell"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("zcell").parquet(s"$path/data")
    import spark.implicits._
    Seq((colA, colB, bitsPer, 1 << bitsPer, aMin, aMax, bMin, bMax, pinned))
      .toDF("col_a", "col_b", "bits_per", "cells",
        "a_min", "a_max", "b_min", "b_max", "pinned")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Compact a cell-partitioned artifact dir in place: every append
    * leaves one-file-per-cell-touched, so after d daily appends a probe
    * opens O(d) files per cell — this rewrites each cell back to ~one
    * compacted file (the build-time repartition-by-cell discipline,
    * re-applied). Writes to a sibling temp dir and swaps via rename, so
    * concurrent READERS that already planned their scan keep a
    * consistent view of whichever tree they resolved; the swap itself
    * is not transactional (a crash between delete and rename loses the
    * tree — production would swap a manifest/metadata pointer instead,
    * the seam this method isolates). Content is bit-identical: rows,
    * partition values, and schema are unchanged, only file boundaries
    * move. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         dir: String, partCol: String): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(hconf)
    require(fs.exists(target), s"compactPartitioned: no artifact at $dir")
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    fs.delete(tmp, true)
    // materialize BEFORE the swap: the write to tmp finishes while the
    // original tree is still intact, so a failure mid-write leaves the
    // artifact untouched
    spark.read.parquet(dir)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    require(fs.delete(target, true), s"compactPartitioned: cannot remove $dir")
    require(fs.rename(tmp, target),
      s"compactPartitioned: rename $tmp -> $dir failed")
  }

  /** [[compactPartitioned]] over a [[writeZordered]] layout's data tree
    * (meta untouched — compaction never changes geometry). */
  def compactZordered(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
    compactPartitioned(spark, s"$path/data", "zcell")

  /** Co-located join layout: persist a relation BUCKETED (and
    * bucket-sorted) by its join key as a catalog table. Two relations
    * written this way with the SAME bucket count join with NO shuffle
    * on either side — the bucket spec is a persisted hash
    * partitioning Catalyst recognizes, so the sort-merge join's
    * exchanges (the per-query cost that dominates a repeated big-big
    * join) disappear; at 100 TB this turns every daily
    * fact-to-dimension-history join into a map-side zip of
    * co-numbered buckets. The trade, stated plainly: the bucket count
    * is FROZEN at write time (re-bucketing is a rewrite), small
    * bucket counts cap join parallelism, and the layout only elides
    * exchanges for equi-joins on a prefix of the bucket keys —
    * LayoutSpec asserts the exchange-free plan rather than trusting
    * this comment. */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
                    key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
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
    val zcells = zCellsForBox(
      bucketOf(aLo, aMin, aMax, cells), bucketOf(aHi, aMin, aMax, cells),
      bucketOf(bLo, bMin, bMax, cells), bucketOf(bHi, bMin, bMax, cells),
      bitsPer)
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
