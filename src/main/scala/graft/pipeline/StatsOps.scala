package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics over integral columns — the corpus
  * length/quality cutoffs a training-data pipeline derives before
  * filtering (e.g. "drop docs below the p10 token count").
  *
  * Scale shape: one parallel groupBy on the VALUE, then a VALUE-RANGE-
  * BUCKETED two-pass cumulative sum over the distinct-value relation
  * (in-bucket running sums via a partitioned window + per-bucket prefix
  * offsets folded with higher-order functions — no window or join over
  * anything unbounded, so a high-cardinality or continuous metric
  * distributes instead of funneling through one task), and a broadcast
  * of |quantiles| rank thresholds. No global sort of the data, no
  * interpolation (discrete quantiles: value at rank ceil(q·n)) —
  * bit-identical across engines, unlike approx_percentile/quantile_cont
  * whose FP interpolation differs. */
object StatsOps {

  /** Exact discrete quantiles of `valueExpr`: for each permille p, the
    * smallest value whose cumulative count reaches ceil(p·n/1000).
    * Quantiles are PERMILLE INTEGERS (p50 = 500) so the rank arithmetic
    * is pure integer math — a fractional q would be a DOUBLE literal in
    * Spark but a DECIMAL in DuckDB, and ceil(0.1·n) rounds differently
    * between those. Returns (q_permille, value). */
  def exactQuantiles(df: DataFrame, valueExpr: Column,
                     permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p > 0 && p <= 1000))
    // NULL metric values are excluded on BOTH engines: Spark's window
    // ordering puts nulls first while DuckDB's ORDER BY puts them last,
    // which would shift every cumulative count — and a quantile over
    // nulls is meaningless anyway. n counts non-null values only.
    val vals = df.select(valueExpr.as("v")).filter(col("v").isNotNull)
    val cnts = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
    // Distributed cumulative count: bucket the distinct-value relation
    // by VALUE RANGE, running-sum WITHIN each bucket (a partitioned
    // window), then add the bucket's prefix offset — the former global
    // Window.orderBy(v) moved EVERY distinct value through one task,
    // fine for bounded integral metrics but a funnel on continuous ones.
    // The bucket id is a DETERMINISTIC function of (v, collected
    // min/max) — not spark_partition_id over repartitionByRange, whose
    // sampled boundaries differ per evaluation: this plan consumes the
    // bucketed relation twice (offsets + cumsum), and a
    // nondeterministic pid would mismatch the two sides whenever the
    // exchanges are not physically deduplicated.
    // Uniform-width buckets balance by RANGE, not count — a pathological
    // distribution concentrates buckets (still bounded by the old
    // single-partition behavior, never wrong); NaN doubles land past the
    // last bucket, matching NaN-sorts-greatest on both engines.
    val nBuckets = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // double-cast bucketing is only monotone in the NATURAL ordering for
    // numeric metrics — a string metric's lexicographic order disagrees
    // with its numeric cast ("9" > "10"), which would scramble the
    // cross-bucket prefix. Non-numeric orderable metrics take one bucket
    // (the pre-round-4 single-window behavior: correct, not distributed).
    val isNumeric = vals.schema("v").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // ONE snapshot job over the raw value relation, collected at
    // plan-construction time (scalar-sized, the same pattern as the ANN
    // centroid collects): the FINITE min/max that seed the bucket
    // function, plus the total non-null count n that seeds the rank
    // thresholds — folding n in here removes what used to be a separate
    // full scan for `count(*)`. It is one map-side-partially-aggregated
    // pass over the RAW values (cheaper than materializing the grouped
    // relation twice); a caller whose metric is expensive to derive
    // should persist the value column first (CorpusFilter does exactly
    // that). min/max exclude NaN (Spark's max treats NaN as greatest —
    // one NaN row would make mx = NaN → width fallback → every finite
    // value in one bucket) AND ±Infinity (an infinite endpoint collapses
    // width to Infinity and funnels every finite value into bucket 0);
    // the excluded values are routed to the correct END buckets below,
    // where the within-bucket ORDER BY v keeps them in rank order.
    val vd = col("v").cast("double")
    val finiteV = when(!isnan(vd) &&
      vd > Double.NegativeInfinity && vd < Double.PositiveInfinity, vd)
    val (mnOpt, mxOpt, n) = if (isNumeric) {
      val r = vals.agg(min(finiteV).as("mn"), max(finiteV).as("mx"),
        count(lit(1)).as("n")).collect()(0)
      (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))
    } else {
      (None, None, vals.agg(count(lit(1)).as("n")).collect()(0).getLong(0))
    }
    val pid = if (!isNumeric) lit(0L) else {
      val (mn, mx) = (mnOpt.getOrElse(0.0), mxOpt.getOrElse(0.0))
      val width = if (mx > mn) (mx - mn) / nBuckets else 1.0
      when(isnan(vd), lit(nBuckets.toLong + 1))
        .when(vd === Double.PositiveInfinity, lit(nBuckets.toLong))
        .when(vd === Double.NegativeInfinity, lit(-1L))
        .otherwise(least(lit(nBuckets.toLong - 1), greatest(lit(0L),
          floor((vd - lit(mn)) / lit(width)).cast("long"))))
    }
    val parts = cnts.withColumn("pid", pid)
    val wIn = Window.partitionBy(col("pid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prefix offsets: ONE row per range partition (bounded by the
    // shuffle-partition count), folded into a single sorted array and
    // prefix-summed with columnar higher-order functions — no window
    // (nothing for WindowExec to funnel), no join, one scalar-sized
    // aggregate
    val ps = col("ps")
    val offsets = parts.groupBy(col("pid")).agg(sum(col("c")).as("psum"))
      .agg(sort_array(collect_list(struct(col("pid"), col("psum")))).as("ps"))
      .select(explode(transform(ps, (s, i) => struct(
        s.getField("pid").as("pid"),
        aggregate(slice(ps, lit(1), i), lit(0L),
          (a, x) => a + x.getField("psum")).as("offset")))).as("o"))
      .select(col("o.pid").as("pid"), col("o.offset").as("offset"))
    val cum = parts.withColumn("cum_in", sum(col("c")).over(wIn))
      .join(broadcast(offsets), "pid")
      .select(col("v"), (col("cum_in") + col("offset")).as("cum"))
    // ceil(p*n/1000) = floorDiv(p*n + 999, 1000) — pure integral math,
    // exact at any n (a double-division path could shift a rank by one
    // once p*n+999 exceeds 2^53). n comes from the snapshot above, so
    // the rank thresholds are LITERALS — no extra count scan, no join.
    val ranks = permille.map(p =>
      (p.toLong, java.lang.Math.floorDiv(p.toLong * n + 999L, 1000L)))
    val qr = explode(array(ranks.map { case (p, r) =>
      struct(lit(p).as("q_permille"), lit(r).as("rank")) }: _*)).as("qr")
    cum.select(col("v"), col("cum"), qr)
      .groupBy(col("qr").getField("q_permille").as("q_permille"))
      .agg(min(when(col("cum") >= col("qr").getField("rank"), col("v"))).as("value"))
  }

  /** Data-derived quantile BIN assignment — the curriculum/stratification
    * primitive: derive the metric's exact quantile cutoffs once
    * ([[exactQuantiles]] — scalar-sized result collected at plan time,
    * same pattern as the ANN centroid snapshots), then label every row
    * with the count of cutoffs at or below its value. With permille
    * 250/500/750 this yields quartile bins 0..3. The labeling pass is
    * MAP-ONLY (a fold over |permille| broadcast literals), so the whole
    * op costs the quantile derivation plus one projection regardless of
    * corpus size. Rows with a NULL metric get a NULL bin. Duplicate
    * cutoff values count once each — a degenerate distribution
    * concentrates bins, never misorders them. */
  def withQuantileBin(df: DataFrame, valueExpr: Column, permille: Seq[Int],
                      binCol: String = "bin"): DataFrame = {
    require(!df.columns.contains(binCol), s"input already has column $binCol")
    val cuts = exactQuantiles(df, valueExpr, permille).collect()
      .filter(r => !r.isNullAt(1))
      .map(_.get(1))
    if (cuts.isEmpty) return df.withColumn(binCol, lit(null).cast("long"))
    val count = cuts.map(c => when(valueExpr >= lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn(binCol,
      when(valueExpr.isNull, lit(null).cast("long")).otherwise(count))
  }

  /** Per-group exact discrete quantiles — `exactQuantiles` partitioned
    * by group columns (e.g. "p50 and p90 token count PER SOURCE"). Same
    * integer-exact rank arithmetic; one shuffle on the group keys, with
    * the cumulative and total counts as two frames over the same
    * value-grouped relation (tiny per group: one row per distinct
    * value). Returns (groupCols..., q_permille, value). */
  def exactQuantilesByGroup(df: DataFrame, groupCols: Seq[String],
                            valueExpr: Column, permille: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "use exactQuantiles for the ungrouped form")
    require(permille.nonEmpty && permille.forall(p => p > 0 && p <= 1000))
    val clash = groupCols.toSet.intersect(Set("v", "c", "cum", "n", "q_permille", "rank", "value"))
    require(clash.isEmpty, s"group columns clash with internal/output names: $clash")
    val gs = groupCols.map(col)
    val vals = df.select(gs :+ valueExpr.as("v"): _*).filter(col("v").isNotNull)
    val cnts = vals.groupBy(gs :+ col("v"): _*).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = cnts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val pn = col("q_permille") * col("n") + 999
    cum.withColumn("q_permille",
        explode(array(permille.map(p => lit(p.toLong)): _*)))
      .withColumn("rank", call_function("div", pn, lit(1000L)))
      .groupBy(gs :+ col("q_permille"): _*)
      .agg(min(when(col("cum") >= col("rank"), col("v"))).as("value"))
  }

  // ---- mergeable quantile sketch -----------------------------------------
  // The quantile sibling of the HLL sketch: exact quantiles need the
  // full distinct-value relation (a sort-shaped shuffle a 100 TB
  // monitor can't pay daily), so this sketch buckets values into a
  // BOUNDED relation — log2 regions with 2^subBits linear sub-buckets
  // (values below 2^subBits stay EXACT) — whose counts are
  // sum-mergeable like HLL registers. The bucket function is pure
  // integer arithmetic (bit length + shifts), identical in both
  // engines, so sketch quantiles are deterministic and bit-exact
  // cross-engine; the reported value is the bucket's LOWER bound,
  // under-reporting the true quantile by a RELATIVE error < 2^-subBits
  // by construction (spec-measured against the exact operator).

  /** Per-group bucket-count sketch over a NON-NEGATIVE integral metric:
    * (group…, __qs_b, __qs_n), ≤ groups × (64−s)·2^s rows regardless of
    * data size. Bucket id: v itself below 2^s; otherwise
    * (msb−s+1)·2^s + (top s bits after the leading one) — monotone in
    * v, so cumulative ranks work on bucket ids directly. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String],
                     valueExpr: Column, subBits: Int = 5): DataFrame = {
    require(groupCols.nonEmpty, "quantileSketch requires group columns")
    requireQsBits(subBits)
    requireNoQsClash(groupCols)
    val gs = groupCols.map(col)
    val small = 1L << subBits
    val v = col("__qs_v")
    val msb = (length(bin(v)) - 1).cast("long")
    val shift = msb - subBits
    val b = when(v < small, v).otherwise(
      (msb - subBits + 1) * small +
        pmod(call_function("div", v,
          call_function("shiftleft", lit(1L), shift.cast("int"))), lit(small)))
    df.select(gs :+ valueExpr.as("__qs_v"): _*)
      .filter(col("__qs_v").isNotNull && col("__qs_v") >= 0L)
      .select(gs :+ b.as("__qs_b"): _*)
      .groupBy(gs :+ col("__qs_b"): _*)
      .agg(count(lit(1)).as("__qs_n"))
  }

  /** Permille quantiles from a [[quantileSketch]] relation (or a UNION
    * of several — the leading re-aggregation makes day-over-day merges
    * a plain union, the HLL-register argument). Same integer rank
    * arithmetic as [[exactQuantilesByGroup]]; the emitted `value_lb` is
    * the winning bucket's lower bound. Returns (group…, q_permille,
    * value_lb). */
  def quantilesFromSketch(sketch: DataFrame, groupCols: Seq[String],
                          permille: Seq[Int], subBits: Int = 5): DataFrame = {
    require(groupCols.nonEmpty, "quantilesFromSketch requires group columns")
    require(permille.nonEmpty && permille.forall(p => p > 0 && p <= 1000))
    requireQsBits(subBits)
    requireNoQsClash(groupCols)
    val gs = groupCols.map(col)
    val small = 1L << subBits
    val merged = sketch.groupBy(gs :+ col("__qs_b"): _*)
      .agg(sum(col("__qs_n")).as("__qs_n"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("__qs_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val b = col("__qs_b")
    val m = call_function("div", b, lit(small)) + (subBits - 1)
    val lower = when(b < small, b).otherwise(
      call_function("shiftleft", lit(1L), m.cast("int")) +
        pmod(b, lit(small)) *
          call_function("shiftleft", lit(1L), (m - subBits).cast("int")))
    merged
      .withColumn("__qs_cum", sum(col("__qs_n")).over(wCum))
      .withColumn("__qs_tot", sum(col("__qs_n")).over(wAll))
      .withColumn("q_permille",
        explode(array(permille.map(p => lit(p.toLong)): _*)))
      .withColumn("__qs_rank", call_function("div",
        col("q_permille") * col("__qs_tot") + 999, lit(1000L)))
      .groupBy(gs :+ col("q_permille"): _*)
      .agg(min(when(col("__qs_cum") >= col("__qs_rank"), lower))
        .as("value_lb"))
  }

  /** One-shot sketch quantiles: build + read in one plan — the form a
    * daily monitor uses when it doesn't persist the sketch. */
  def sketchQuantilesByGroup(df: DataFrame, groupCols: Seq[String],
                             valueExpr: Column, permille: Seq[Int],
                             subBits: Int = 5): DataFrame =
    quantilesFromSketch(quantileSketch(df, groupCols, valueExpr, subBits),
      groupCols, permille, subBits)

  private def requireQsBits(subBits: Int): Unit =
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")

  /** The exactQuantilesByGroup discipline: a group column named like an
    * internal or output column would be silently clobbered by the
    * withColumn chain (a group column literally called `q_permille`
    * would lose the group identity before the final groupBy). */
  private def requireNoQsClash(groupCols: Seq[String]): Unit = {
    val clash = groupCols.toSet.intersect(Set("__qs_v", "__qs_b", "__qs_n",
      "__qs_cum", "__qs_tot", "__qs_rank", "q_permille", "value_lb"))
    require(clash.isEmpty,
      s"group columns clash with internal/output names: $clash")
  }

  /** [[sketchQuantilesByGroup]]'s DuckDB form over a (group, v)
    * relation `src` — the same bucket/lower/rank integer arithmetic,
    * mirrored token for token. */
  def sketchQuantilesByGroupSql(srcSql: String, groupCol: String,
                                permille: Seq[Int],
                                subBits: Int = 5): String = {
    val small = 1L << subBits
    val qb = s"""CASE WHEN v < $small THEN v
                | ELSE (length(bin(v)) - ${subBits + 1} + 1) * $small
                |   + (v // (1::BIGINT << (length(bin(v)) - ${subBits + 1})))
                |     % $small END""".stripMargin.replace("\n", " ")
    val lower = s"""CASE WHEN qb < $small THEN qb
                   | ELSE (1::BIGINT << CAST(qb // $small + ${subBits - 1} AS INT))
                   |   + (qb % $small) * (1::BIGINT <<
                   |       CAST(qb // $small - 1 AS INT)) END"""
      .stripMargin.replace("\n", " ")
    s"""WITH vals AS (
       |  SELECT $groupCol, v FROM ($srcSql)
       |  WHERE v IS NOT NULL AND v >= 0
       |), sk AS (
       |  SELECT $groupCol, $qb AS qb, count(*) AS c
       |  FROM vals GROUP BY $groupCol, qb
       |), cum AS (
       |  SELECT $groupCol, qb,
       |    CAST(sum(c) OVER (PARTITION BY $groupCol ORDER BY qb
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY $groupCol) AS BIGINT) AS n
       |  FROM sk
       |), q AS (
       |  SELECT cum.*, q_permille,
       |    (q_permille * n + 999) // 1000 AS rank
       |  FROM cum, (SELECT unnest([${permille.map(p => s"${p}::BIGINT").mkString(", ")}]) AS q_permille)
       |)
       |SELECT $groupCol, q_permille,
       |  CAST(min(CASE WHEN cum >= rank THEN $lower END) AS BIGINT) AS value_lb
       |FROM q GROUP BY $groupCol, q_permille""".stripMargin
  }

  // ---- persisted quantile-sketch index (the 8th stored artifact) ---------
  // Same epoch-dir + meta-swap + shared-GC discipline as the HLL
  // register index: bucket relations live in immutable `buckets/e<N>`
  // dirs, the meta pointer (geometry pin + epoch + completeness count)
  // swaps LAST, counts are SUM-mergeable so appends fold a delta-sized
  // bucket relation — each day folds its sketch in, and the quantile
  // read touches a bounded relation, never the data.

  /** Meta row: sub-bits pin + group columns + epoch pointer +
    * committed bucket-row count (interrupted-write detection) + the
    * last streaming batch id folded in. `lastBatchId` exists because
    * bucket COUNTS — unlike HLL register maxes — are not idempotent: a
    * replayed micro-batch would double-count, so the streaming ingest
    * ([[ingestQuantileBatch]]) records each applied batch id behind
    * the same last-swapped meta as the epoch pointer and skips
    * replays. Batch-API appends leave it untouched (-1 = never
    * stream-fed). */
  private[graft] final case class QuantileIndexMeta(
      subBits: Int, groupCols: Seq[String], bucketRows: Long, epoch: Long,
      lastBatchId: Long = -1L)

  private def qsEpochDir(path: String, epoch: Long): String =
    s"$path/buckets/e$epoch"

  private def swapQsMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String, meta: QuantileIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "quantile index",
      Seq((meta.subBits.toLong, meta.groupCols.mkString(","),
          meta.bucketRows, meta.epoch, meta.lastBatchId))
        .toDF("sub_bits", "group_cols", "bucket_rows", "epoch",
          "last_batch_id"))
  }

  private[graft] def readQuantileIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): QuantileIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "quantile index", "index")
    QuantileIndexMeta(r.getAs[Long]("sub_bits").toInt,
      r.getAs[String]("group_cols").split(",").toSeq,
      r.getAs[Long]("bucket_rows"), r.getAs[Long]("epoch"),
      r.getAs[Long]("last_batch_id"))
  }

  private def commitQsEpoch(spark: org.apache.spark.sql.SparkSession,
                            path: String, sketch: DataFrame,
                            groupCols: Seq[String], subBits: Int,
                            epoch: Long, lastBatchId: Long,
                            segments: Option[DataFrame] = None): Unit = {
    sketch.write.mode("overwrite").parquet(qsEpochDir(path, epoch))
    // the epoch's covered-SEGMENT ledger (the walked/covered-docs
    // pattern applied to this value fold): one row per orchestrator
    // segment ever folded, committed with the epoch so the meta swap
    // publishes buckets and ledger atomically. Callers without an
    // identity to record carry the previous epoch's ledger forward.
    segments.getOrElse(readQsSegments(spark, path, epoch - 1))
      .select(col("segment_id").cast("string").as("segment_id")).distinct()
      .write.mode("overwrite").parquet(qsSegmentsDir(path, epoch))
    val stored = spark.read.parquet(qsEpochDir(path, epoch))
    swapQsMeta(spark, path,
      QuantileIndexMeta(subBits, groupCols, stored.count(), epoch,
        lastBatchId))
    // shared epoch GC: the commit of `epoch` supersedes `epoch - 1`
    // (epochs advance by exactly 1; the initial commit passes -1 → no-op)
    MetaIO.pruneEpochs(spark, Seq(s"$path/buckets", s"$path/segments"),
      superseded = epoch - 1)
  }

  private def qsSegmentsDir(path: String, epoch: Long): String =
    s"$path/segments/e$epoch"

  /** The epoch's covered-segment ids; a PRE-LEDGER epoch (or epoch -1
    * on the initial commit) has no segments relation — read it as
    * empty, so legacy artifacts keep appending exactly as before. */
  private def readQsSegments(spark: org.apache.spark.sql.SparkSession,
                             path: String, epoch: Long): DataFrame = {
    val d = new org.apache.hadoop.fs.Path(qsSegmentsDir(path, epoch))
    if (epoch >= 0 &&
        d.getFileSystem(spark.sessionState.newHadoopConf()).exists(d))
      spark.read.parquet(d.toString)
    else {
      import spark.implicits._
      Seq.empty[String].toDF("segment_id")
    }
  }

  /** Build-and-persist: one partial-aggregated bucket fold over the
    * data (the plan's only corpus-sized shuffle) → epoch 0 commit. */
  def writeQuantileIndex(df: DataFrame, groupCols: Seq[String],
                         value: Column, path: String,
                         subBits: Int = 5): Unit = {
    requireQsBits(subBits)
    commitQsEpoch(df.sparkSession, path,
      quantileSketch(df, groupCols, value, subBits), groupCols, subBits,
      epoch = 0L, lastBatchId = -1L)
  }

  /** Fold a new data slice in: the DELTA's bucket relation SUM-merges
    * with the stored one by (group, bucket) into a NEW immutable
    * epoch — one bucket fold over the delta plus a bounded merge
    * groupBy; earlier data is never rescanned. Geometry (subBits) and
    * group columns are pinned by meta. */
  def appendQuantileIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, df: DataFrame,
                          value: Column): Unit = {
    val meta = readQuantileIndexMeta(spark, path)
    val delta = quantileSketch(df, meta.groupCols, value, meta.subBits)
    val merged = spark.read.parquet(qsEpochDir(path, meta.epoch))
      .unionByName(delta)
      .groupBy(meta.groupCols.map(col) :+ col("__qs_b"): _*)
      .agg(sum(col("__qs_n")).as("__qs_n"))
    commitQsEpoch(spark, path, merged, meta.groupCols, meta.subBits,
      meta.epoch + 1, meta.lastBatchId)
  }

  /** EXACTLY-ONCE streaming ingest for the quantile index — the
    * foreachBatch body of a micro-batched sketch feed. Bucket counts
    * are NOT idempotent (HLL's max is; a replayed batch here would
    * double-count), so each applied batch id commits WITH the epoch
    * behind the same last-swapped meta: on a foreachBatch retry the
    * recorded `lastBatchId` makes the replay a no-op, and a commit
    * that died before the meta swap left the old pointer — the retry
    * re-applies cleanly. First call on an empty path builds the
    * artifact; a path whose meta is missing because a swap died
    * mid-commit is RECOVERED, and bucket epochs with no recoverable
    * meta are refused loudly — never rebuilt over. Returns whether the
    * batch was applied. Batch ids must arrive non-decreasing
    * (Structured Streaming's contract): a replay at or one below the
    * stored pointer skips quietly, an id regressing further (a reset
    * checkpoint, a second maintainer) REFUSES loudly — bucket counts
    * are value folds, so a silently-dropped batch is lost data with no
    * anti-join to catch it; backfill via [[appendQuantileIndex]], once
    * (it has no replay protection of its own — the round-16 segment
    * ledger in [[ingestQuantileSegment]] adds an identity when the
    * orchestrator can name one). */
  def ingestQuantileBatch(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame,
                          groupCols: Seq[String], value: Column,
                          batchId: Long, subBits: Int = 5): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "quantile index",
        s"$path/buckets")
      requireQsBits(subBits)
      commitQsEpoch(spark, path,
        quantileSketch(batch, groupCols, value, subBits), groupCols,
        subBits, epoch = 0L, lastBatchId = batchId)
      true
    } else {
      val meta = readQuantileIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("quantile index", path,
          batchId, meta.lastBatchId, "counts",
          "ingestQuantileSegment (with a ledger id) or appendQuantileIndex")
        false // replayed batch: no-op
      } else {
        val delta = quantileSketch(batch, meta.groupCols, value,
          meta.subBits)
        val merged = spark.read.parquet(qsEpochDir(path, meta.epoch))
          .unionByName(delta)
          .groupBy(meta.groupCols.map(col) :+ col("__qs_b"): _*)
          .agg(sum(col("__qs_n")).as("__qs_n"))
        commitQsEpoch(spark, path, merged, meta.groupCols, meta.subBits,
          meta.epoch + 1, batchId)
        true
      }
    }
  }

  /** LEDGERED append for the quantile index — the opt-in re-drop
    * protection for orchestrated (non-streaming) feeds. Bucket counts
    * are the one genuinely identity-free value fold in the artifact
    * family: rows carry no id an anti-join could key on, so a retried
    * orchestration step that re-lands a slice would silently
    * double-count it through [[appendQuantileIndex]]. When the CALLER
    * can name the slice (a crawl day, a segment path — any stable
    * string), this entry point records that name in a covered-segments
    * relation committed behind the same meta swap as the buckets (the
    * walked/covered-docs pattern applied to a value fold): a re-drop
    * of a covered `segmentId` is a NO-OP, crash-safe because ledger
    * and buckets publish atomically — a commit that died pre-swap left
    * neither, so the retry re-applies cleanly. First call on an empty
    * path builds the artifact. Unledgered appends and the streaming
    * ingest compose freely with this (they carry the ledger forward
    * untouched); semantics without a ledger are exactly
    * [[appendQuantileIndex]]'s. Returns whether the segment was
    * applied (false = already covered). */
  def ingestQuantileSegment(spark: org.apache.spark.sql.SparkSession,
                            path: String, df: DataFrame,
                            groupCols: Seq[String], value: Column,
                            segmentId: String, subBits: Int = 5): Boolean = {
    import spark.implicits._
    require(segmentId.nonEmpty, "segmentId must be a non-empty name")
    val one = Seq(segmentId).toDF("segment_id")
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "quantile index",
        s"$path/buckets")
      requireQsBits(subBits)
      commitQsEpoch(spark, path,
        quantileSketch(df, groupCols, value, subBits), groupCols,
        subBits, epoch = 0L, lastBatchId = -1L, segments = Some(one))
      true
    } else {
      val meta = readQuantileIndexMeta(spark, path)
      val covered = readQsSegments(spark, path, meta.epoch)
      // the ledger is bounded by segments-ever-folded (one short row
      // per orchestration step) — the filter is a cheap scan of it
      if (!covered.filter(col("segment_id") === segmentId).isEmpty)
        false // re-dropped segment: the retry is a no-op
      else {
        val delta = quantileSketch(df, meta.groupCols, value, meta.subBits)
        val merged = spark.read.parquet(qsEpochDir(path, meta.epoch))
          .unionByName(delta)
          .groupBy(meta.groupCols.map(col) :+ col("__qs_b"): _*)
          .agg(sum(col("__qs_n")).as("__qs_n"))
        commitQsEpoch(spark, path, merged, meta.groupCols, meta.subBits,
          meta.epoch + 1, meta.lastBatchId,
          segments = Some(covered.unionByName(one)))
        true
      }
    }
  }

  /** Quantiles off the STORED sketch: no data scan — the input is the
    * bounded bucket relation of the meta-pointed epoch (resolved once,
    * so a probe racing an append sees one consistent snapshot).
    * Identical to [[sketchQuantilesByGroup]] over the union of every
    * slice ever folded in (bucket counts are associative sums). */
  def quantilesFromStoredSketch(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                permille: Seq[Int]): DataFrame = {
    val meta = readQuantileIndexMeta(spark, path)
    val stored = spark.read.parquet(qsEpochDir(path, meta.epoch))
    val storedRows = stored.count() // one job; reused in the message
    require(storedRows == meta.bucketRows,
      s"quantile index at $path: epoch ${meta.epoch} holds " +
        s"$storedRows bucket rows, meta pins ${meta.bucketRows} — " +
        "incomplete or foreign epoch")
    quantilesFromSketch(stored, meta.groupCols, permille, meta.subBits)
  }

  /** Per-group exact moments: count, sum, mean and population variance
    * of an integral metric — corpus monitoring numbers that must agree
    * bit-for-bit across engines. Sums are integer-exact (one
    * partial-aggregated shuffle); mean and variance are each ONE double
    * division of exact integers at the end —
    * var = (n·Σv² − (Σv)²) / n², no per-row FP accumulation, so no
    * engine-order-dependent rounding. The squared sums and the n·Σv² /
    * (Σv)² products are carried in DecimalType(38,0) — int64 would wrap
    * silently once a group's Σv passes ~3e9 (trivial for per-source
    * token totals at corpus scale) while the DuckDB oracle sums in
    * HUGEINT, diverging exactly where the bit-for-bit contract matters.
    * Exact while n·Σv² < 1e38 (≈ the oracle's HUGEINT ceiling of
    * 1.7e38); past that Spark yields NULL rather than a wrong number.
    * NULL metrics are excluded. */
  def momentsByGroup(df: DataFrame, groupCols: Seq[String],
                     valueExpr: Column): DataFrame = {
    require(groupCols.nonEmpty, "momentsByGroup requires group columns")
    val gs = groupCols.map(col)
    val v = valueExpr.cast("long")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v19 = v.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    df.filter(v.isNotNull)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n"), sum(v).as("sum"),
        sum(v19 * v19).as("__m_ss"))
      .select(gs ++ Seq(col("n"), col("sum"),
        (col("sum").cast("double") / col("n").cast("double")).as("mean"),
        ((col("n").cast(dec) * col("__m_ss") -
            col("sum").cast(dec) * col("sum").cast(dec)).cast("double") /
          (col("n").cast(dec) * col("n").cast(dec)).cast("double")).as("variance")): _*)
  }

  /** Fixed-width histogram of a non-negative integral metric: one
    * map-only bucket projection + one partial-aggregated shuffle on the
    * bucket id — the monitoring view behind every length/quality
    * dashboard. Returns (bucket, lo inclusive, hi exclusive, n).
    * Negative values fail loudly per-row (integral div disagrees
    * between engines below zero — floor vs truncate — so the operator
    * refuses the ambiguity); NULLs are excluded. */
  def histogram(df: DataFrame, valueExpr: Column, width: Long): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val v = valueExpr.cast("long")
    val guarded = when(v < 0, raise_error(
        concat(lit("histogram: negative metric value "), v.cast("string")))
        .cast("long"))
      .otherwise(v)
    df.filter(v.isNotNull)
      .select(call_function("div", guarded, lit(width)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"), col("n"))
  }

  private val HllAlphaPermille = 709L

  private def requireHllM(m: Int): Unit =
    require(m >= 64 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [64, 4096], got $m")

  /** Width of the rho bit-stream for m registers. The poly hash carries
    * floor(log2(Mod)) ≈ 29.9 bits (Mod = 1e9+7); the bucket index
    * consumes log2(m) of them, so the quotient h // m ranges over
    * [0, Mod/m) and only floor(log2(Mod/m)) of its low bits are fully
    * covered. A FIXED width (the pre-round-10 WBits = 23) is only sound
    * for m = 64 (Mod/64 ≈ 15.6M ≥ 2^23): at m = 128 the quotient tops
    * out below 2^23, so w's high bits were permanently zero — every
    * register max inflated and the estimate overshot ~2× at m = 256 up
    * to ~32× at m = 4096. Deriving the width from m (23 at m=64 … 17 at
    * m=4096) keeps the register distribution estimator-grade across the
    * whole supported range; the Spark and DuckDB forms share this one
    * derivation so the oracle stays bit-exact. */
  private def hllWBits(m: Int): Int =
    63 - java.lang.Long.numberOfLeadingZeros(
      graft.functions.StringPolyHash.Mod / m)

  /** Per-group HLL register relation (group…, __hll_b, __hll_m):
    * ≤ groups × m rows regardless of data size, and register maxes
    * merge associatively — this is the persistable, mergeable sketch
    * state every HLL entry point builds on.
    *
    * No floating point anywhere: the register index is the hash mod m,
    * the next WBits hash bits (WBits = floor(log2(Mod/m)), see
    * [[hllWBits]]) form w, and rho = (WBits+1) − bit_length(w) via the
    * length-of-binary-string trick both engines share (w = 0 →
    * WBits+1). The non-linear post-mix — two rounds of modular
    * squaring — exists because the raw poly hash of SHORT sequential
    * strings is near-arithmetic (it may never even wrap the modulus),
    * and any LINEAR mix maps arithmetic progressions to arithmetic
    * progressions, leaving the per-register rho distribution
    * structured; squaring (Weyl-style equidistribution) breaks the
    * linearity. h < 2^30 keeps h² < 2^60: exact in both engines, no
    * overflow, no floats. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   value: Column, m: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "hllRegisters needs group columns")
    requireHllM(m)
    val WBits = hllWBits(m)
    val gs = groupCols.map(col)
    val p0 = graft.functions.StringPolyHash.Mod
    def sqMix(c: Column): Column = {
      val r1 = pmod(c * c + lit(2654435761L), lit(p0))
      pmod(r1 * r1 + lit(40503L), lit(p0))
    }
    val rows = df.select(gs :+ value.as("__hll_v"): _*)
      .filter(col("__hll_v").isNotNull)
      .select(gs :+
        sqMix(graft.functions.StringPolyHash.polyHash(col("__hll_v").cast("string")))
          .as("__hll_h"): _*)
    val w = pmod(call_function("div", col("__hll_h"), lit(m.toLong)),
      lit(1L << WBits))
    val rhoCap = (WBits + 1).toLong
    rows
      .withColumn("__hll_b", pmod(col("__hll_h"), lit(m.toLong)))
      .withColumn("__hll_rho",
        when(w === 0L, lit(rhoCap)).otherwise(lit(rhoCap) - length(bin(w))))
      .groupBy(gs :+ col("__hll_b"): _*)
      .agg(max(col("__hll_rho")).as("__hll_m"))
  }

  /** Integer-exact raw-HLL estimate from a register relation (as
    * produced by [[hllRegisters]], or a UNION of several such — the
    * leading max-merge re-folds duplicate (group, bucket) rows, which
    * is what makes persisted register epochs appendable by plain
    * union). The harmonic mean runs in integers scaled by
    * 2^(WBits+1): 2^(−M_j) becomes the exact integer 2^(WBits+1−M_j),
    * empty registers contribute 2^(WBits+1), and
    *
    *   n_est = (ALPHA_PERMILLE · m² · 2^(WBits+1)) // (S₂ · 1000)
    *
    * with α_m pinned as a permille literal (709‰ — the m ≥ 64
    * constant).
    *
    * SMALL-RANGE branch: below 2.5·m the raw estimator is biased
    * (Flajolet et al.'s published cutoff), so when the raw estimate is
    * ≤ 5m/2 AND empty registers remain, the standard linear-counting
    * correction n = m·ln(m/V) (V = empty registers) is used instead —
    * with ln as a PINNED integer-micros literal table over 1..m
    * ([[lnMicros]]), so both engines compute the identical integer and
    * the branch needs no runtime transcendental. Estimates at or above
    * the cutoff (the vocabulary-monitor regime) are byte-for-byte what
    * the raw estimator always produced. */
  def hllEstimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
                               m: Int = 64): DataFrame = {
    requireHllM(m)
    val WBits = hllWBits(m)
    val scale = 1L << (WBits + 1)
    val rhoCap = (WBits + 1).toLong
    val gs = groupCols.map(col)
    val merged = regs.groupBy(gs :+ col("__hll_b"): _*)
      .agg(max(col("__hll_m")).as("__hll_m"))
    // lazy loud geometry guard (the snapshotDiff discipline): m must
    // equal the m the registers were built at — a register bucket id
    // ≥ m proves a build at larger m and would otherwise drive
    // (m − present) negative and the estimate silently nonsensical.
    // The guarded value is the per-group AGGREGATED max bucket id, not
    // a row predicate on __hll_b: a plain filter on the grouping key
    // pushes below the register fold and re-evaluates the whole hash
    // kernel per INPUT row (caught in the executed plan during
    // development); the aggregate form rides the groups-sized relation
    // for free. (A build at SMALLER m is not detectable from bucket
    // ids alone; the persisted-index path pins m in meta for exactly
    // that reason — prefer it when the build site is remote.)
    merged.groupBy(gs: _*)
      .agg(count(lit(1)).as("__hll_present"),
        sum(call_function("shiftleft", lit(1L), lit(rhoCap) - col("__hll_m")))
          .as("__hll_s2p"),
        max(col("__hll_b")).as("__hll_bmax"))
      .filter(assert_true(col("__hll_bmax") < m,
        concat(lit("hllEstimateFromRegisters: register bucket "),
          col("__hll_bmax").cast("string"),
          lit(s" >= m = $m — these registers were built at a larger m; " +
            "pass the build-time m"))).isNull)
      .select(gs ++ Seq(col("__hll_present"),
        (col("__hll_s2p") +
          (lit(m.toLong) - col("__hll_present")) * lit(scale))
          .as("__hll_s2")): _*)
      .select(gs :+ {
        val raw = call_function("div",
          lit(HllAlphaPermille * m * m * scale),
          col("__hll_s2") * lit(1000L))
        val v = lit(m.toLong) - col("__hll_present")
        // ln table as literals: element_at is 1-based, v ∈ [1, m-1]
        val lnArr = array((1 to m).map(x => lit(lnMicros(x))): _*)
        val nLc = call_function("div",
          lit(m.toLong) * (lit(lnMicros(m)) - element_at(lnArr, v.cast("int"))),
          lit(1000000L))
        when(v > 0L && raw <= lit(5L * m / 2), nLc).otherwise(raw)
          .as("n_est")
      }: _*)
  }

  /** round(ln(x)·10⁶) — the pinned integer ln table behind the
    * linear-counting branch. Evaluated at PLAN-construction time in
    * Scala and embedded as literals in both the Spark expression and
    * the generated oracle SQL, so the two engines agree exactly. */
  private[graft] def lnMicros(x: Int): Long =
    math.round(math.log(x.toDouble) * 1e6)

  /** SKETCH-ONLY per-group distinct-count estimate — the entry point a
    * 100 TB corpus actually uses: the plan's only corpus-sized shuffle
    * is the partial-aggregated register groupBy, and everything after
    * it is ≤ groups × m rows. No exact countDistinct anywhere (that
    * shuffles every distinct value — exactly the cost this sketch
    * exists to avoid); use [[hllDistinctByGroup]] when you want the
    * measured-error evaluation harness instead. Returns (group…,
    * n_est). */
  def hllEstimateByGroup(df: DataFrame, groupCols: Seq[String],
                         value: Column, m: Int = 64): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCols, value, m),
      groupCols, m)

  /** EVALUATION wrapper: the sketch estimate next to the exact count
    * and the measured error, in one pass over the data — the
    * accuracy-monitor form (err_permille keeps the accuracy claim
    * measured, not assumed). This form deliberately pays the exact
    * count-distinct shuffle; for the scale path use
    * [[hllEstimateByGroup]]. Returns (group…, n_exact, n_est,
    * err_permille). */
  def hllDistinctByGroup(df: DataFrame, groupCols: Seq[String],
                         value: Column, m: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "hllDistinctByGroup needs group columns")
    requireHllM(m)
    val gs = groupCols.map(col)
    val est = hllEstimateByGroup(df, groupCols, value, m)
    val exact = df.select(gs :+ value.as("__hll_v"): _*)
      .filter(col("__hll_v").isNotNull)
      .groupBy(gs: _*)
      .agg(countDistinct(col("__hll_v")).as("n_exact"))
    exact.join(est, groupCols)
      .select(gs ++ Seq(col("n_exact"), col("n_est"),
        call_function("div", abs(col("n_est") - col("n_exact")) * 1000L,
          col("n_exact")).as("err_permille")): _*)
  }

  // ---- persisted HLL register index (the 7th stored artifact) ----------
  // Same epoch-dir + meta-swap discipline as the MinHash / LM /
  // decontamination artifacts: register relations live in immutable
  // `regs/e<N>/` dirs, the meta pointer (geometry pin + epoch +
  // completeness count) swaps LAST, and readers racing an append
  // resolve the previous epoch. Registers are MAX-mergeable, so an
  // append is one partial-aggregated max groupBy over (stored ∪ delta)
  // — cost ∝ delta plus the ≤ groups × m stored relation, never a
  // rescan of earlier data. This is what makes the sketch the 100 TB
  // cardinality monitor: each day folds its registers in, and the
  // estimate reads a bounded relation.

  /** Meta row: register count pin (m), group column names, epoch
    * pointer, and the committed register-row count (interrupted-write
    * detection: a commit that died before the meta swap leaves the old
    * meta in place; one that died mid-epoch-write is caught by the
    * epoch dir's own _SUCCESS marker since estimates only read the
    * meta-pointed epoch). */
  private[graft] final case class HllIndexMeta(
      m: Int, groupCols: Seq[String], regRows: Long, epoch: Long)

  private def hllEpochDir(path: String, epoch: Long): String =
    s"$path/regs/e$epoch"

  private def swapHllMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String, meta: HllIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "hll index",
      Seq((meta.m.toLong, meta.groupCols.mkString(","), meta.regRows,
          meta.epoch))
        .toDF("m", "group_cols", "reg_rows", "epoch"))
  }

  private[graft] def readHllIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): HllIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "hll index", "index")
    HllIndexMeta(r.getAs[Long]("m").toInt,
      r.getAs[String]("group_cols").split(",").toSeq,
      r.getAs[Long]("reg_rows"), r.getAs[Long]("epoch"))
  }

  private def commitHllEpoch(spark: org.apache.spark.sql.SparkSession,
                             path: String, regs: DataFrame,
                             groupCols: Seq[String], m: Int,
                             epoch: Long): Unit = {
    regs.write.mode("overwrite").parquet(hllEpochDir(path, epoch))
    val stored = spark.read.parquet(hllEpochDir(path, epoch))
    swapHllMeta(spark, path,
      HllIndexMeta(m, groupCols, stored.count(), epoch))
    // epoch GC after the swap (the MinHash-index discipline): the
    // superseded epoch stays for in-flight-estimate grace, older ones
    // go — otherwise each append leaks a full register relation.
    // Epochs advance by exactly 1, so the commit of `epoch` supersedes
    // `epoch - 1`; the initial commit (epoch 0) passes -1 → no-op.
    MetaIO.pruneEpochs(spark, Seq(s"$path/regs"), superseded = epoch - 1)
  }

  /** Build-and-persist: one partial-aggregated register fold over the
    * data (the plan's only corpus-sized shuffle) → epoch 0 commit. */
  def writeHllIndex(df: DataFrame, groupCols: Seq[String], value: Column,
                    path: String, m: Int = 64): Unit = {
    requireHllM(m)
    commitHllEpoch(df.sparkSession, path,
      hllRegisters(df, groupCols, value, m), groupCols, m, epoch = 0L)
  }

  /** Fold a new data slice into the stored registers: the DELTA's
    * register relation max-merges with the stored one by (group,
    * bucket) into a NEW immutable epoch — one register fold over the
    * delta plus a ≤ 2 × groups × m merge groupBy; earlier data is
    * never rescanned. Geometry (m) and group columns are pinned by
    * meta, so an append can't silently change the sketch's shape. */
  def appendHllIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, df: DataFrame, value: Column): Unit = {
    val meta = readHllIndexMeta(spark, path)
    val delta = hllRegisters(df, meta.groupCols, value, meta.m)
    val merged = spark.read.parquet(hllEpochDir(path, meta.epoch))
      .unionByName(delta)
      .groupBy(meta.groupCols.map(col) :+ col("__hll_b"): _*)
      .agg(max(col("__hll_m")).as("__hll_m"))
    commitHllEpoch(spark, path, merged, meta.groupCols, meta.m,
      meta.epoch + 1)
  }

  /** Distinct-count estimate off the STORED registers: no data scan at
    * all — the input is the ≤ groups × m register relation of the
    * meta-pointed epoch (resolved once, so a probe racing an append
    * sees one consistent snapshot). Returns (group…, n_est), identical
    * to [[hllEstimateByGroup]] over the union of every slice ever
    * folded in (register max is associative — pinned by HllSpec /
    * the q_hll_stored oracle). */
  def estimateFromStoredHll(spark: org.apache.spark.sql.SparkSession,
                            path: String): DataFrame = {
    val meta = readHllIndexMeta(spark, path)
    hllEstimateFromRegisters(
      spark.read.parquet(hllEpochDir(path, meta.epoch)),
      meta.groupCols, meta.m)
  }

  /** Shared DuckDB CTE chain (rows0 → regs → sk) over a (group, v)
    * relation `src`; the constants mirror [[hllWBits]] exactly. */
  private def hllSketchCtesSql(srcSql: String, groupCol: String,
                               m: Int): String = {
    val ph0 = graft.functions.StringPolyHash.polyHashSql("CAST(v AS VARCHAR)")
    val p0 = graft.functions.StringPolyHash.Mod
    val ph = s"(((($ph0) * ($ph0) + 2654435761) % $p0)" +
      s" * ((($ph0) * ($ph0) + 2654435761) % $p0) + 40503) % $p0"
    val WBits = hllWBits(m)
    val wMod = 1L << WBits
    val rhoCap = WBits + 1
    val scale = 1L << rhoCap
    s"""rows0 AS (
       |  SELECT $groupCol, v, $ph AS h FROM ($srcSql) WHERE v IS NOT NULL
       |), regs AS (
       |  SELECT $groupCol, h % $m AS b,
       |    max(CASE WHEN (h // $m) % $wMod = 0 THEN $rhoCap
       |        ELSE $rhoCap - length(bin((h // $m) % $wMod)) END) AS mj
       |  FROM rows0 GROUP BY $groupCol, b
       |), sk AS (
       |  SELECT $groupCol,
       |    CAST(sum(1::BIGINT << ($rhoCap - mj)) AS BIGINT)
       |      + ($m - count(*)) * $scale AS s2,
       |    CAST(count(*) AS BIGINT) AS present
       |  FROM regs GROUP BY $groupCol
       |)""".stripMargin
  }

  private def hllEstSqlExpr(m: Int): String = {
    val scale = 1L << (hllWBits(m) + 1)
    val raw = s"CAST(${HllAlphaPermille * m * m}::BIGINT * ${scale}::BIGINT" +
      s" // (sk.s2 * 1000) AS BIGINT)"
    // linear-counting branch below the published 2.5·m cutoff, with the
    // same pinned integer-micros ln table the Spark expression embeds
    val lnList = (1 to m).map(lnMicros).mkString("[", ", ", "]")
    s"""(CASE WHEN ($m - sk.present) > 0 AND $raw <= ${5L * m / 2}
       | THEN CAST(${m}::BIGINT * (${lnMicros(m)} -
       |   ($lnList)[CAST($m - sk.present AS INT)]) // 1000000 AS BIGINT)
       | ELSE $raw END)""".stripMargin.replace("\n", " ")
  }

  /** [[hllEstimateByGroup]]'s DuckDB form over a (group, v) relation. */
  def hllEstimateByGroupSql(srcSql: String, groupCol: String,
                            m: Int = 64): String =
    s"""WITH ${hllSketchCtesSql(srcSql, groupCol, m)}
       |SELECT sk.$groupCol, ${hllEstSqlExpr(m)} AS n_est FROM sk""".stripMargin

  /** [[hllDistinctByGroup]]'s DuckDB form over a (group, v) relation. */
  def hllDistinctByGroupSql(srcSql: String, groupCol: String,
                            m: Int = 64): String =
    s"""WITH ${hllSketchCtesSql(srcSql, groupCol, m)}, ex AS (
       |  SELECT $groupCol, count(DISTINCT v) AS n_exact FROM rows0
       |  GROUP BY $groupCol
       |)
       |SELECT ex.$groupCol, ex.n_exact,
       |  ${hllEstSqlExpr(m)} AS n_est,
       |  CAST(abs(${hllEstSqlExpr(m)}
       |    - ex.n_exact) * 1000 // ex.n_exact AS BIGINT) AS err_permille
       |FROM ex JOIN sk USING ($groupCol)""".stripMargin

  /** Matching DuckDB SQL over a one-column relation `src` (alias v). */
  def exactQuantilesSql(srcSql: String, permille: Seq[Int]): String =
    s"""WITH vals AS (SELECT v FROM ($srcSql) WHERE v IS NOT NULL),
       |cnts AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
       |cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
       |        FROM cnts),
       |ranks AS (
       |  SELECT q_permille, (q_permille * n + 999) // 1000 AS rank
       |  FROM (SELECT unnest([${permille.map(p => s"${p}::BIGINT").mkString(", ")}]) AS q_permille),
       |       (SELECT count(*) AS n FROM vals)
       |)
       |SELECT q_permille, min(CASE WHEN cum >= rank THEN v END) AS value
       |FROM cum, ranks GROUP BY q_permille""".stripMargin

  // -------------------------------------------------------------------
  // Count-min frequency sketch (Cormode & Muthukrishnan, "An improved
  // data stream summary: the count-min sketch and its applications",
  // J. Algorithms 2005) — the FREQUENCY member of the sketch family:
  // HLL answers "how many distinct", the quantile sketch answers "what
  // value at rank r", this answers "how often does item x occur"
  // without ever holding the key space. depth×width integer cells,
  // point estimate = min over rows, NEVER an underestimate; cell-wise
  // SUM is the merge, so sketches of slices union into the sketch of
  // the whole — the property the persisted-epoch lifecycle below and
  // any per-executor partial aggregation both lean on.
  // -------------------------------------------------------------------

  /** Pinned Carter–Wegman row-hash constants h_j = (A_j·h + B_j) mod P,
    * P = StringPolyHash.Mod: arbitrary fixed values in [1, P) / [0, P),
    * identical literals in the Spark expression and the DuckDB oracle.
    * (P−1)·A_j + B_j < 2^60 — exact int64 in both engines. */
  private val CmsA = Seq(1000003L, 998244353L, 777767777L, 433494437L,
    268435459L, 918273645L, 500000003L, 122949829L)
  private val CmsB = Seq(0L, 362436069L, 521288629L, 88675123L,
    5783321L, 6615241L, 987654321L, 43112609L)

  /** Max depth is the pinned constant table's length; width caps keep
    * the cell relation executor-trivial (≤ groups × depth × width). */
  private[graft] def requireCmsGeom(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= CmsA.length,
      s"cms depth must be in [1, ${CmsA.length}], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"cms width must be in [16, 2^20], got $width")
  }

  /** The same two-round modular-squaring mix HLL uses, same constants,
    * same rationale (see [[hllRegisters]]): the raw poly hash of short
    * sequential strings is near-arithmetic, and the row hashes are
    * LINEAR in h — without a non-linear pre-mix, an arithmetic
    * progression of items walks every row's cells in lockstep and
    * collisions stop being independent across rows. h < 2^30 keeps
    * h² < 2^60: exact, no floats. */
  private def cmsMix(h0: Column): Column = {
    val p0 = graft.functions.StringPolyHash.Mod
    val r1 = pmod(h0 * h0 + lit(2654435761L), lit(p0))
    pmod(r1 * r1 + lit(40503L), lit(p0))
  }

  private def cmsHashed(df: DataFrame, groupCols: Seq[String],
                        value: Column): DataFrame = {
    val clash = df.columns.filter(_.startsWith("__cms_"))
    require(clash.isEmpty,
      s"input already has reserved __cms_ columns: ${clash.toSet}")
    df.select(groupCols.map(col) :+ value.as("__cms_v"): _*)
      .filter(col("__cms_v").isNotNull)
      .withColumn("__cms_h", cmsMix(graft.functions.StringPolyHash
        .polyHash(col("__cms_v").cast("string"))))
  }

  /** (…, __cms_j, __cms_cell) for j in [0, depth): the row/cell address
    * of one item under the pinned hash family. */
  private def withCmsCells(hashed: DataFrame, depth: Int,
                           width: Int): DataFrame = {
    val p0 = graft.functions.StringPolyHash.Mod
    val aArr = array(CmsA.take(depth).map(lit): _*)
    val bArr = array(CmsB.take(depth).map(lit): _*)
    hashed
      .withColumn("__cms_j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("__cms_cell", pmod(
        pmod(element_at(aArr, col("__cms_j") + 1) * col("__cms_h")
          + element_at(bArr, col("__cms_j") + 1), lit(p0)),
        lit(width.toLong)))
  }

  /** Per-group count-min cell relation (group…, __cms_j, __cms_cell,
    * __cms_n): ≤ groups × depth × width rows regardless of input size.
    * ONE pass over the data — the groupBy partial-aggregates map-side,
    * so the shuffle carries at most the cell relation per partition,
    * never the item stream. Null items drop (the HLL convention). */
  def cmsCells(df: DataFrame, groupCols: Seq[String], value: Column,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    require(groupCols.nonEmpty, "cmsCells needs group columns")
    requireCmsGeom(depth, width)
    withCmsCells(cmsHashed(df, groupCols, value), depth, width)
      .groupBy(groupCols.map(col) :+ col("__cms_j") :+ col("__cms_cell"): _*)
      .agg(count(lit(1)).as("__cms_n"))
  }

  /** Point estimates off a cell relation: for each probe row (group…,
    * itemCol), est = min over the depth rows of its cell counts, 0 when
    * a cell is absent (an item the sketch never saw). The guarantee is
    * one-sided: est ≥ the item's true count, always. The cell relation
    * is ≤ groups × depth × width rows, so AQE broadcasts it and the
    * probe side never shuffles beyond its own depth-fold groupBy. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame,
                  groupCols: Seq[String], itemCol: String,
                  depth: Int, width: Int): DataFrame = {
    requireCmsGeom(depth, width)
    val missing = (groupCols ++ Seq("__cms_j", "__cms_cell", "__cms_n"))
      .filterNot(cells.columns.contains)
    require(missing.isEmpty,
      s"cmsEstimate: `cells` is not a cmsCells relation for groups " +
        s"$groupCols — missing columns $missing. The geometry args must " +
        "also match the build's (depth, width): a mismatch silently " +
        "probes the wrong cells, which is why the stored path reads " +
        "them from meta instead")
    val gs = groupCols.map(col)
    val pc = withCmsCells(
      cmsHashed(probes, groupCols, col(itemCol)), depth, width)
      .select(gs :+ col("__cms_v").as(itemCol) :+ col("__cms_j")
        :+ col("__cms_cell"): _*)
    pc.join(cells, groupCols :+ "__cms_j" :+ "__cms_cell", "left")
      .groupBy(gs :+ col(itemCol): _*)
      .agg(min(coalesce(col("__cms_n"), lit(0L))).as("est"))
  }

  /** Heavy hitters in one declarative plan: items whose CMS estimate
    * reaches `minFreq`, returned as (group…, itemCol, est). No false
    * negatives ever (est ≥ truth); false positives are bounded by the
    * sketch's ε = e/width overestimate band. The candidate relation is
    * the distinct item stream — linear, one shuffle — and at serving
    * scale the candidates come from a delta batch probed against a
    * STORED sketch ([[estimateFromStoredCms]]) instead. */
  def cmsHeavyHitters(df: DataFrame, groupCols: Seq[String], value: Column,
                      depth: Int, width: Int, minFreq: Long,
                      itemCol: String = "item"): DataFrame = {
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val items = df.select(groupCols.map(col) :+ value.as(itemCol): _*)
      .filter(col(itemCol).isNotNull)
    val cells = cmsCells(items, groupCols, col(itemCol), depth, width)
    cmsEstimate(cells, items.distinct(), groupCols, itemCol, depth, width)
      .filter(col("est") >= minFreq)
  }

  /** Evaluation form — (group…, itemCol, n_exact, est) for every item
    * the sketch flags at `minFreq`: the exact count sits next to the
    * estimate so the overestimate band is MEASURED in the row, the
    * hllDistinctByGroup discipline. A flagged false positive (est ≥
    * minFreq, n_exact < minFreq) appears with its true count — that is
    * the honest CMS semantics, and the oracle reproduces it exactly. */
  def cmsHeavyHittersWithExact(df: DataFrame, groupCols: Seq[String],
                               value: Column, depth: Int, width: Int,
                               minFreq: Long,
                               itemCol: String = "item"): DataFrame = {
    val items = df.select(groupCols.map(col) :+ value.as(itemCol): _*)
      .filter(col(itemCol).isNotNull)
    val exact = items.groupBy(groupCols.map(col) :+ col(itemCol): _*)
      .agg(count(lit(1)).as("n_exact"))
    cmsHeavyHitters(df, groupCols, value, depth, width, minFreq, itemCol)
      .join(exact, groupCols :+ itemCol)
      .select(groupCols.map(col) :+ col(itemCol) :+ col("n_exact")
        :+ col("est"): _*)
  }

  // --- persisted CMS lifecycle (the epoch'd-artifact discipline the
  // --- HLL register index set: immutable epoch dirs, meta swapped
  // --- last, superseded epochs GC'd one commit late) ---

  private[graft] final case class CmsIndexMeta(
      depth: Int, width: Int, groupCols: Seq[String], cellRows: Long,
      epoch: Long, lastBatchId: Long)

  private def cmsEpochDir(path: String, epoch: Long): String =
    s"$path/cells/e$epoch"

  private def cmsSegmentsDir(path: String, epoch: Long): String =
    s"$path/segments/e$epoch"

  /** The epoch's covered-segment ids; a pre-ledger epoch (or epoch -1
    * on the initial commit) has no segments relation — read as empty. */
  private def readCmsSegments(spark: org.apache.spark.sql.SparkSession,
                              path: String, epoch: Long): DataFrame = {
    val d = new org.apache.hadoop.fs.Path(cmsSegmentsDir(path, epoch))
    if (epoch >= 0 &&
        d.getFileSystem(spark.sessionState.newHadoopConf()).exists(d))
      spark.read.parquet(d.toString)
    else {
      import spark.implicits._
      Seq.empty[String].toDF("segment_id")
    }
  }

  private def swapCmsMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String, meta: CmsIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "cms index",
      Seq((meta.depth.toLong, meta.width.toLong,
          meta.groupCols.mkString(","), meta.cellRows, meta.epoch,
          meta.lastBatchId))
        .toDF("depth", "width", "group_cols", "cell_rows", "epoch",
          "last_batch_id"))
  }

  private[graft] def readCmsIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): CmsIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "cms index", "index")
    CmsIndexMeta(r.getAs[Long]("depth").toInt, r.getAs[Long]("width").toInt,
      r.getAs[String]("group_cols").split(",").toSeq,
      r.getAs[Long]("cell_rows"), r.getAs[Long]("epoch"),
      r.getAs[Long]("last_batch_id"))
  }

  private def commitCmsEpoch(spark: org.apache.spark.sql.SparkSession,
                             path: String, cells: DataFrame,
                             groupCols: Seq[String], depth: Int, width: Int,
                             epoch: Long, lastBatchId: Long,
                             segments: Option[DataFrame] = None): Unit = {
    cells.write.mode("overwrite").parquet(cmsEpochDir(path, epoch))
    // the covered-segment ledger commits with the epoch so the meta
    // swap publishes cells and ledger atomically (the quantile-index
    // discipline); callers without an identity carry it forward
    segments.getOrElse(readCmsSegments(spark, path, epoch - 1))
      .select(col("segment_id").cast("string").as("segment_id")).distinct()
      .write.mode("overwrite").parquet(cmsSegmentsDir(path, epoch))
    val stored = spark.read.parquet(cmsEpochDir(path, epoch))
    swapCmsMeta(spark, path,
      CmsIndexMeta(depth, width, groupCols, stored.count(), epoch,
        lastBatchId))
    MetaIO.pruneEpochs(spark, Seq(s"$path/cells", s"$path/segments"),
      superseded = epoch - 1)
  }

  /** Build-and-persist: one partial-aggregated cell fold over the data
    * (the plan's only corpus-sized shuffle) → epoch 0 commit. */
  def writeCmsIndex(df: DataFrame, groupCols: Seq[String], value: Column,
                    path: String, depth: Int = 4, width: Int = 1024): Unit = {
    requireCmsGeom(depth, width)
    commitCmsEpoch(df.sparkSession, path,
      cmsCells(df, groupCols, value, depth, width), groupCols, depth,
      width, epoch = 0L, lastBatchId = -1L)
  }

  /** Fold a new data slice into the stored cells: the DELTA's cell
    * relation SUM-merges with the stored one by (group, j, cell) into a
    * NEW immutable epoch — one cell fold over the delta plus a
    * ≤ 2 × groups × depth × width merge groupBy; earlier data is never
    * rescanned. Geometry and group columns are pinned by meta. NO
    * replay protection of its own (cell counts are an identity-free
    * value fold): a retried feed goes through [[ingestCmsBatch]] or
    * [[ingestCmsSegment]] instead. */
  def appendCmsIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, df: DataFrame, value: Column): Unit = {
    val meta = readCmsIndexMeta(spark, path)
    val delta = cmsCells(df, meta.groupCols, value, meta.depth, meta.width)
    val merged = spark.read.parquet(cmsEpochDir(path, meta.epoch))
      .unionByName(delta)
      .groupBy(meta.groupCols.map(col) :+ col("__cms_j")
        :+ col("__cms_cell"): _*)
      .agg(sum(col("__cms_n")).as("__cms_n"))
    commitCmsEpoch(spark, path, merged, meta.groupCols, meta.depth,
      meta.width, meta.epoch + 1, meta.lastBatchId)
  }

  /** EXACTLY-ONCE streaming ingest — the foreachBatch body of a
    * micro-batched frequency feed. Cell counts are NOT idempotent (a
    * replayed batch would double-count), so each applied batch id
    * commits WITH the epoch behind the same last-swapped meta: on a
    * foreachBatch retry the recorded `lastBatchId` makes the replay a
    * no-op; a commit that died before the swap left the old pointer,
    * so the retry re-applies cleanly. An id regressing by more than
    * the one-batch replay window (a reset checkpoint, a second
    * maintainer) REFUSES loudly. First call on an empty path builds
    * the artifact; cells with no recoverable meta are refused, never
    * rebuilt over. Returns whether the batch was applied. */
  def ingestCmsBatch(spark: org.apache.spark.sql.SparkSession,
                     path: String, batch: DataFrame,
                     groupCols: Seq[String], value: Column,
                     batchId: Long, depth: Int = 4,
                     width: Int = 1024): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "cms index", s"$path/cells")
      requireCmsGeom(depth, width)
      commitCmsEpoch(spark, path,
        cmsCells(batch, groupCols, value, depth, width), groupCols,
        depth, width, epoch = 0L, lastBatchId = batchId)
      true
    } else {
      val meta = readCmsIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("cms index", path,
          batchId, meta.lastBatchId, "counts",
          "ingestCmsSegment (with a ledger id) or appendCmsIndex")
        false // replayed batch: no-op
      } else {
        val delta = cmsCells(batch, meta.groupCols, value, meta.depth,
          meta.width)
        val merged = spark.read.parquet(cmsEpochDir(path, meta.epoch))
          .unionByName(delta)
          .groupBy(meta.groupCols.map(col) :+ col("__cms_j")
            :+ col("__cms_cell"): _*)
          .agg(sum(col("__cms_n")).as("__cms_n"))
        commitCmsEpoch(spark, path, merged, meta.groupCols, meta.depth,
          meta.width, meta.epoch + 1, batchId)
        true
      }
    }
  }

  /** LEDGERED append — the opt-in re-drop protection for orchestrated
    * (non-streaming) feeds, exactly the quantile index's segment
    * ledger: when the caller can NAME the slice (a crawl day, a
    * segment path), the name commits in a covered-segments relation
    * behind the same meta swap as the cells, and a re-drop of a
    * covered `segmentId` is a no-op — crash-safe because a commit that
    * died pre-swap left neither cells nor ledger. First call on an
    * empty path builds the artifact. Returns whether the segment was
    * applied (false = already covered). */
  def ingestCmsSegment(spark: org.apache.spark.sql.SparkSession,
                       path: String, df: DataFrame,
                       groupCols: Seq[String], value: Column,
                       segmentId: String, depth: Int = 4,
                       width: Int = 1024): Boolean = {
    import spark.implicits._
    require(segmentId.nonEmpty, "segmentId must be a non-empty name")
    val one = Seq(segmentId).toDF("segment_id")
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "cms index", s"$path/cells")
      requireCmsGeom(depth, width)
      commitCmsEpoch(spark, path,
        cmsCells(df, groupCols, value, depth, width), groupCols, depth,
        width, epoch = 0L, lastBatchId = -1L, segments = Some(one))
      true
    } else {
      val meta = readCmsIndexMeta(spark, path)
      val covered = readCmsSegments(spark, path, meta.epoch)
      if (!covered.filter(col("segment_id") === segmentId).isEmpty)
        false // re-dropped segment: the retry is a no-op
      else {
        val delta = cmsCells(df, meta.groupCols, value, meta.depth,
          meta.width)
        val merged = spark.read.parquet(cmsEpochDir(path, meta.epoch))
          .unionByName(delta)
          .groupBy(meta.groupCols.map(col) :+ col("__cms_j")
            :+ col("__cms_cell"): _*)
          .agg(sum(col("__cms_n")).as("__cms_n"))
        commitCmsEpoch(spark, path, merged, meta.groupCols, meta.depth,
          meta.width, meta.epoch + 1, meta.lastBatchId,
          segments = Some(covered.unionByName(one)))
        true
      }
    }
  }

  /** Frequency estimates off the STORED cells for a probe relation —
    * no data scan: the inputs are the probe stream and the
    * ≤ groups × depth × width cell relation of the meta-pointed epoch
    * (resolved once, so a probe racing an append sees one consistent
    * snapshot). Cell sum is associative, so this ≡ the one-shot
    * estimate over the union of every slice ever folded in. */
  def estimateFromStoredCms(spark: org.apache.spark.sql.SparkSession,
                            path: String, probes: DataFrame,
                            itemCol: String): DataFrame = {
    val meta = readCmsIndexMeta(spark, path)
    cmsEstimate(spark.read.parquet(cmsEpochDir(path, meta.epoch)), probes,
      meta.groupCols, itemCol, meta.depth, meta.width)
  }

  /** Shared DuckDB CTE chain over a (group, v) relation `src`:
    * rows0 → r1/hs (the two-round mix, each round computed once) →
    * cellrows (the depth × rows cell addresses) → cells (the sketch) →
    * est (min-over-rows point estimates for every distinct item).
    * Constants mirror [[CmsA]]/[[CmsB]]/[[cmsMix]] exactly. */
  private def cmsCtesSql(srcSql: String, groupCol: String, depth: Int,
                         width: Int): String = {
    val ph = graft.functions.StringPolyHash.polyHashSql("CAST(v AS VARCHAR)")
    val p0 = graft.functions.StringPolyHash.Mod
    val aList = CmsA.take(depth).mkString("[", ", ", "]")
    val bList = CmsB.take(depth).mkString("[", ", ", "]")
    s"""rows0 AS (
       |  SELECT $groupCol, v FROM ($srcSql) WHERE v IS NOT NULL
       |), h0 AS (
       |  SELECT $groupCol, v, $ph AS h0 FROM rows0
       |), r1 AS (
       |  SELECT $groupCol, v, (h0 * h0 + 2654435761) % $p0 AS r1 FROM h0
       |), hs AS (
       |  SELECT $groupCol, v, (r1 * r1 + 40503) % $p0 AS h FROM r1
       |), cellrows AS (
       |  SELECT $groupCol, v, j,
       |    ((($aList)[j + 1] * h + ($bList)[j + 1]) % $p0) % $width AS cell
       |  FROM hs, (SELECT unnest(range(0, $depth)) AS j)
       |), cells AS (
       |  SELECT $groupCol, j, cell, CAST(count(*) AS BIGINT) AS n
       |  FROM cellrows GROUP BY $groupCol, j, cell
       |), est AS (
       |  SELECT p.$groupCol, p.v, min(coalesce(c.n, 0::BIGINT)) AS est
       |  FROM (SELECT DISTINCT $groupCol, v, j, cell FROM cellrows) p
       |  LEFT JOIN cells c ON p.$groupCol = c.$groupCol AND p.j = c.j
       |    AND p.cell = c.cell
       |  GROUP BY p.$groupCol, p.v
       |)""".stripMargin
  }

  /** [[cmsCells]]'s DuckDB form over a (group, v) relation — the raw
    * sketch, aliased (group, j, cell, n). */
  def cmsCellsSql(srcSql: String, groupCol: String, depth: Int,
                  width: Int): String =
    s"""WITH ${cmsCtesSql(srcSql, groupCol, depth, width)}
       |SELECT $groupCol, j, cell, n FROM cells""".stripMargin

  /** [[cmsHeavyHitters]]'s DuckDB form: (group, itemCol, est). */
  def cmsHeavyHittersSql(srcSql: String, groupCol: String, itemCol: String,
                         depth: Int, width: Int, minFreq: Long): String =
    s"""WITH ${cmsCtesSql(srcSql, groupCol, depth, width)}
       |SELECT $groupCol, v AS $itemCol, est FROM est
       |WHERE est >= $minFreq""".stripMargin

  /** [[cmsHeavyHittersWithExact]]'s DuckDB form:
    * (group, itemCol, n_exact, est). */
  def cmsHeavyHittersWithExactSql(srcSql: String, groupCol: String,
                                  itemCol: String, depth: Int, width: Int,
                                  minFreq: Long): String =
    s"""WITH ${cmsCtesSql(srcSql, groupCol, depth, width)}, exact AS (
       |  SELECT $groupCol, v, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM rows0 GROUP BY $groupCol, v
       |)
       |SELECT est.$groupCol, est.v AS $itemCol, exact.n_exact, est.est
       |FROM est JOIN exact ON est.$groupCol = exact.$groupCol
       |  AND est.v = exact.v
       |WHERE est.est >= $minFreq""".stripMargin
}
