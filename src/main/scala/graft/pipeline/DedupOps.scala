package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, Spark-first:
  *
  * - exact dedup: hash-groupBy on content digest — one shuffle on the
  *   digest, arbitrarily parallel;
  * - MinHash + LSH near-dup: shingle → per-doc signature (map-only) →
  *   band explosion → shuffle on (band, band_hash) → candidate pairs.
  *   At 100 TB the only shuffled data is (doc_id, band_hash) pairs —
  *   signatures and text stay columnar in the map stage;
  * - SimHash: 48-bit per-doc signature (map-only), near-dups = equal
  *   signatures (or small Hamming distance via multi-probe);
  * - n-gram Jaccard: exact verification on candidate pairs (explode +
  *   join), intended to run AFTER LSH pruning, never all-pairs.
  *
  * All hashing is engine-portable (MD5-derived via HashFns, or the
  * codegen'd StringPolyHash byte fold) so every op has an exact DuckDB
  * oracle.
  */
object DedupOps {

  /** Content digest for exact dedup. */
  def digest(c: Column): Column = md5(c.cast("binary"))

  /** Cross-source duplication matrix: for every pair of sources, how
    * many distinct contents appear in BOTH — the dedup-analytics view
    * that tells a corpus owner which ingestion feeds overlap (and
    * therefore which dedup passes pay off). Shape: distinct
    * (digest, source) is the only corpus-sized shuffle (partial-agg
    * combined); the per-digest source set is bounded by the source
    * count, so the i<j pair expansion is a map-only O(s²) explode —
    * never a self-join on the digest, which a content shared by every
    * source would otherwise turn into a hot key. */
  def sourceOverlap(df: DataFrame, contentCol: String,
                    sourceCol: String): DataFrame =
    sourceOverlapByKey(df.select(digest(col(contentCol)).as("__so_key"),
      col(sourceCol).as("__so_src")))

  /** Key-level core of [[sourceOverlap]]: input is any (key, source)
    * relation — content digests for exact-copy overlap, shingle hashes
    * for n-gram overlap (the corpus-similarity signal that is non-empty
    * even when no document is copied verbatim). Columns must be named
    * (`__so_key`, `__so_src`). */
  def sourceOverlapByKey(keyed: DataFrame): DataFrame = {
    val sets = keyed.distinct()
      .groupBy(col("__so_key"))
      .agg(sort_array(collect_set(col("__so_src"))).as("__so_srcs"))
      .filter(size(col("__so_srcs")) >= 2)
    val pairs = flatten(transform(col("__so_srcs"), (a, i) =>
      transform(slice(col("__so_srcs"), i + 2, size(col("__so_srcs"))),
        b => struct(a.as("src_a"), b.as("src_b")))))
    sets.select(explode(pairs).as("__so_p"))
      .groupBy(col("__so_p.src_a").as("src_a"), col("__so_p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Exact duplicate groups: one row per distinct content, with the
    * representative (min id) and the duplicate count. */
  def exactDupGroups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(digest(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the min-id row per distinct content. One shuffle
    * (window on the digest) instead of aggregate + join — at scale the
    * digest shuffle is the whole cost either way, so pay it once. */
  def dedupExact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(digest(col(contentCol))).orderBy(col(idCol))
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }

  /** Exact dedup keeping the BEST row per distinct content instead of
    * the oldest: among duplicates, the row with the highest
    * `qualityExpr` survives (ties broken by min id, so the choice is
    * deterministic and partitioning-independent). The real-pipeline
    * variant of [[dedupExact]]: crawls re-fetch the same page with
    * different boilerplate stripping, and "keep the cleanest copy"
    * beats "keep the first copy". Identical cost shape — one digest
    * shuffle, WindowGroupLimit prunes rank > 1 map-side. */
  def dedupExactKeepBest(df: DataFrame, contentCol: String, idCol: String,
                         qualityExpr: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(digest(col(contentCol)))
      .orderBy(qualityExpr.desc_nulls_last, col(idCol))
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }

  /** Distinct content digests of a corpus — the persistable index that
    * [[dedupAgainstIndex]] dedups a NEW batch against. Write it out
    * partitioned/bucketed by digest prefix at scale; it is one narrow
    * column regardless of corpus width.
    *
    * The coalesce is semantically unreachable in the join (an
    * empty-string key matches neither an md5 hex nor a null batch key)
    * but marks the column non-nullable, so the anti-join's key
    * null-intolerance cannot push an isnotnull(md5(text)) — a full
    * SECOND hash of every prior document — into the index's scan
    * (caught by PlanAuditSpec's md5 null-check audit). */
  def digestIndex(df: DataFrame, contentCol: String): DataFrame =
    df.select(coalesce(digest(col(contentCol)), lit(""))
      .as("content_hash")).distinct()

  /** Incremental exact dedup: drop rows whose content already appears in
    * a prior corpus snapshot's [[digestIndex]], then dedup the survivors
    * within the batch (keep min id). The daily-crawl shape: the history
    * is consulted as a digest anti-join — one shuffle on the digest (or
    * zero if both sides are bucketed on it); the full historical corpus
    * is never re-read. */
  def dedupAgainstIndex(df: DataFrame, index: DataFrame, contentCol: String,
                        idCol: String): DataFrame = {
    val fresh = df.join(index,
      digest(col(contentCol)) === index("content_hash"), "left_anti")
    dedupExact(fresh, contentCol, idCol)
  }

  /** Pre-hashed variant of [[dedupAgainstIndex]] for bucketed layouts:
    * the batch already carries a `content_hash` COLUMN (not an
    * expression), so when both the batch and the index are stored
    * bucketed by content_hash, the history anti-join AND the in-batch
    * keep-min-id window both have their clustering satisfied by the
    * scan — the whole daily-dedup pass plans with ZERO exchanges
    * (BucketedDedupSpec asserts it). This is the 100 TB operating mode:
    * hash once at ingest, bucket everything by digest, dedup forever
    * shuffle-free. */
  def dedupAgainstIndexPrehashed(df: DataFrame, index: DataFrame,
                                 idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fresh = df.join(index, Seq("content_hash"), "left_anti")
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    fresh.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }

  /** Per-group duplication report: document count, distinct-content
    * count, duplicate count and rate for each group (per source, per
    * language) — the monitoring view that decides where dedup budget
    * goes. One shuffle on the group keys; the distinct count rides
    * Spark's Expand-based count-distinct rewrite (partial aggregation
    * on (group, digest), no second scan). */
  def dupStatsByGroup(df: DataFrame, groupCols: Seq[String],
                      contentCol: String): DataFrame = {
    require(groupCols.nonEmpty, "dupStatsByGroup requires group columns")
    val gs = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(digest(col(contentCol))).as("n_distinct"))
      .select(gs ++ Seq(col("n_docs"), col("n_distinct"),
        (col("n_docs") - col("n_distinct")).as("n_dups"),
        ((col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs").cast("double")).as("dup_rate")): _*)
  }

  // ---- stored exact-digest index lifecycle -------------------------------
  //
  // The PERSISTED form of [[digestIndex]] — exact dedup's managed
  // artifact, completing the family (MinHash, decontamination,
  // media-fingerprint indexes all have one; the MOST common pipeline op
  // did not). A corpus's content digests persist once; every later crawl
  // segment dedups against all of history at probe cost, without the
  // caller owning relation layout, bloom derivation, append idempotence,
  // crash recovery, or compaction. Shared artifact discipline:
  //
  //   path/digests/e<N>   one immutable epoch dir per build/append/compact,
  //                       visible window = meta's [digest_base, epoch]
  //   path/derived/e<N>/bloom   bloom over xxhash64(content_hash)
  //   path/meta           geometry + window + count + applied batch id,
  //                       swapped LAST (MetaIO.swapMetaRow)

  private[graft] final case class DigestIndexMeta(
      bloomBits: Int, bloomHashes: Int, epoch: Long, digestCount: Long,
      digestBase: Long = 0L, lastBatchId: Long = -1L)

  /** One digest epoch's directory. Epoch'd subdirectories under a RANGE
    * pointer ([digest_base, epoch] in meta — the WARC index's layout):
    * each append lands its delta as ONE fresh immutable dir instead of
    * `mode("append")` file-sets into a flat relation, so a torn append's
    * orphan rows are INVISIBLE (the window never covers an unswapped
    * epoch) and compaction is an ordinary epoch commit with no
    * delete-and-rename of a live relation under racing probes. */
  private[graft] def digestsDir(path: String, epoch: Long): String =
    s"$path/digests/e$epoch"

  private def digestDerivedDir(path: String, epoch: Long): String =
    s"$path/derived/e$epoch"

  /** The index's visible digest snapshot: the union of the meta window's
    * epoch dirs, resolved from ONE meta read. */
  private[graft] def readStoredDigests(
      spark: org.apache.spark.sql.SparkSession, path: String,
      meta: DigestIndexMeta): DataFrame =
    spark.read.parquet(
      (meta.digestBase to meta.epoch).map(digestsDir(path, _)): _*)

  private[graft] def readDigestIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): DigestIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "digest index", "index")
    DigestIndexMeta(r.getAs[Int]("bloom_bits"), r.getAs[Int]("bloom_hashes"),
      r.getAs[Long]("epoch"), r.getAs[Long]("digest_count"),
      r.getAs[Long]("digest_base"), r.getAs[Long]("last_batch_id"))
  }

  private def swapDigestMeta(spark: org.apache.spark.sql.SparkSession,
                             path: String, meta: DigestIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "digest index",
      Seq((meta.bloomBits, meta.bloomHashes, meta.epoch, meta.digestCount,
          meta.digestBase, meta.lastBatchId))
        .toDF("bloom_bits", "bloom_hashes", "epoch", "digest_count",
          "digest_base", "last_batch_id"))
  }

  /** One bloom key per stored digest (distinct by construction). */
  private def digestBloomKeys(digests: DataFrame): DataFrame =
    digests.select(xxhash64(col("content_hash")).as("__dk"))

  /** Loud saturation guard — the decontamination index's capacity WARN,
    * one key per digest here: past ~numBits/10 stored digests the
    * prescreen's false-positive rate climbs toward pass-everything;
    * correctness holds (the semi-join re-verifies) but every probe
    * quietly pays the shuffle the bloom exists to skip. */
  private def warnIfDigestBloomSaturated(path: String, digestCount: Long,
                                         numBits: Int): Unit = {
    val capacity = numBits / 10L
    if (digestCount > capacity)
      System.err.println(
        s"[graft] digest index at $path: $digestCount stored digests " +
          s"exceed the $numBits-bit bloom's design capacity " +
          s"(~$capacity at 10 bits/element) — the prescreen's " +
          "false-positive rate is degrading toward pass-everything; " +
          "rebuild with writeDigestIndex and a larger bloomBits")
  }

  /** Build the persisted exact-digest index from a corpus snapshot. */
  def writeDigestIndex(df: DataFrame, contentCol: String, path: String,
                       bloomBits: Int = 1 << 20,
                       bloomHashes: Int = 4): Unit =
    buildDigestIndex(df, contentCol, path, bloomBits, bloomHashes,
      lastBatchId = -1L)

  private def buildDigestIndex(df: DataFrame, contentCol: String,
                               path: String, bloomBits: Int,
                               bloomHashes: Int, lastBatchId: Long): Unit = {
    val spark = df.sparkSession
    digestIndex(df, contentCol)
      .write.mode("overwrite").parquet(digestsDir(path, 0L))
    val stored = spark.read.parquet(digestsDir(path, 0L))
    val bits = graft.functions.BloomFilter.build(
      digestBloomKeys(stored), "__dk", bloomBits, bloomHashes)
    MetaIO.writeBloomWords(spark, bits,
      s"${digestDerivedDir(path, 0L)}/bloom")
    val n = stored.count()
    warnIfDigestBloomSaturated(path, n, bloomBits)
    swapDigestMeta(spark, path,
      DigestIndexMeta(bloomBits, bloomHashes, epoch = 0L, digestCount = n,
        digestBase = 0L, lastBatchId = lastBatchId))
  }

  /** Append a crawl segment's digests — the daily maintenance move. The
    * delta anti-joins against the visible window, so a RE-DROPPED
    * segment adds zero rows (re-drop idempotent by construction — the
    * relation is a distinct digest set) and append DATA cost is
    * proportional to the DELTA plus one bloom OR-merge plus the
    * anti-join's one read of the stored window. The self-heal check
    * also counts the visible window each append; that count reads NO
    * columns (zero-column parquet scan — row counts come from file
    * metadata), so its cost tracks the window's FILE count, which
    * compaction bounds, not its bytes. Meta swaps LAST: a torn append's
    * epoch dir sits outside the window and the retry overwrites it
    * wholesale. */
  def appendDigestIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, df: DataFrame,
                        contentCol: String): Unit = {
    val meta = readDigestIndexMeta(spark, path)
    appendDigestCore(spark, path, meta, df, contentCol, meta.lastBatchId)
  }

  private def appendDigestCore(spark: org.apache.spark.sql.SparkSession,
                               path: String, meta: DigestIndexMeta,
                               df: DataFrame, contentCol: String,
                               lastBatchId: Long): Unit = {
    val visible = readStoredDigests(spark, path, meta)
    // window-covers-digest_count is the layout invariant; on a mismatch
    // (manual surgery on the dirs) the bloom rebuilds from the full
    // visible snapshot instead of delta-merging — defense in depth
    val visibleCount = visible.count()
    val healthy = visibleCount == meta.digestCount
    val delta = digestIndex(df, contentCol)
      .join(visible, Seq("content_hash"), "left_anti")
      .localCheckpoint() // consumed twice: epoch write + bloom delta
    try {
      val next = meta.epoch + 1
      delta.write.mode("overwrite").parquet(digestsDir(path, next))
      val nextDir = digestDerivedDir(path, next)
      val bits =
        if (healthy) {
          val deltaBits = graft.functions.BloomFilter.build(
            digestBloomKeys(delta), "__dk", meta.bloomBits,
            meta.bloomHashes)
          MetaIO.readBloomWords(spark,
              s"${digestDerivedDir(path, meta.epoch)}/bloom",
              meta.bloomBits)
            .zip(deltaBits).map { case (a, b) => a | b }
        } else {
          val all = spark.read.parquet(
            (meta.digestBase to next).map(digestsDir(path, _)): _*)
          graft.functions.BloomFilter.build(
            digestBloomKeys(all), "__dk", meta.bloomBits, meta.bloomHashes)
        }
      MetaIO.writeBloomWords(spark, bits, s"$nextDir/bloom")
      val total = visibleCount + delta.count()
      warnIfDigestBloomSaturated(path, total, meta.bloomBits)
      swapDigestMeta(spark, path,
        meta.copy(epoch = next, digestCount = total,
          lastBatchId = lastBatchId))
      // derived epochs keep {current, superseded}; digest epochs ARE the
      // window — only compaction re-bases and prunes them
      MetaIO.pruneEpochs(spark, Seq(s"$path/derived"),
        superseded = meta.epoch)
    } finally delta.unpersist() // a per-segment maintenance path must
    // not accumulate one checkpointed RDD per append for the session
  }

  /** The streaming maintenance leg — each micro-batch of landed
    * documents commits through here with its batch id recorded behind
    * the meta swap (the [[graft.pipeline.WarcOps.ingestWarcIndexBatch]]
    * discipline). First batch on an empty path builds the artifact; a
    * path whose meta is missing because a swap died mid-commit is
    * RECOVERED, and a path carrying digests with no recoverable meta is
    * refused loudly — never rebuilt over. Returns whether the batch was
    * applied.
    *
    * SINGLE-WRITER, NON-DECREASING batch ids: a batch id at or one
    * below the stored pointer is the crash-replay signature and skips
    * quietly BEFORE hashing anything; an id regressing further is a
    * reset checkpoint or a second maintainer and REFUSES loudly, naming
    * the backfill ([[appendDigestIndex]], which has no pointer and
    * always anti-joins). */
  def ingestDigestBatch(spark: org.apache.spark.sql.SparkSession,
                        path: String, batch: DataFrame, contentCol: String,
                        batchId: Long, bloomBits: Int = 1 << 20,
                        bloomHashes: Int = 4): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "digest index", s"$path/digests")
      buildDigestIndex(batch, contentCol, path, bloomBits, bloomHashes,
        lastBatchId = batchId)
      true
    } else {
      val meta = readDigestIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("digest index", path, batchId,
          meta.lastBatchId, "documents", "appendDigestIndex")
        false // replayed batch: no-op
      } else {
        appendDigestCore(spark, path, meta, batch, contentCol, batchId)
        true
      }
    }
  }

  /** Compact the digest window: rewrite the [digest_base, epoch] union
    * as ONE fresh epoch at `targetFiles` and re-base the pointer — the
    * [[compactMinhashIndex]] move. Without it a continuously-maintained
    * index accumulates one epoch dir per micro-batch in the relation
    * every probe semi-joins. The bloom rebuilds from the compacted
    * relation (bit-identical by construction — same digests); probe
    * output is byte-identical before and after. */
  def compactDigestIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readDigestIndexMeta(spark, path)
    val next = meta.epoch + 1
    readStoredDigests(spark, path, meta).coalesce(targetFiles)
      .write.mode("overwrite").parquet(digestsDir(path, next))
    val compacted = spark.read.parquet(digestsDir(path, next))
    val bits = graft.functions.BloomFilter.build(
      digestBloomKeys(compacted), "__dk", meta.bloomBits, meta.bloomHashes)
    MetaIO.writeBloomWords(spark, bits,
      s"${digestDerivedDir(path, next)}/bloom")
    val total = compacted.count()
    warnIfDigestBloomSaturated(path, total, meta.bloomBits)
    swapDigestMeta(spark, path,
      meta.copy(epoch = next, digestBase = next, digestCount = total))
    MetaIO.pruneEpochs(spark, Seq(s"$path/derived"),
      superseded = meta.epoch)
    MetaIO.pruneEpochs(spark, Seq(s"$path/digests"),
      superseded = meta.digestBase)
  }

  /** Compact when the live epoch window has grown to `maxEpochs` dirs or
    * more — the policy wrapper the continuous maintainer calls after
    * each batch. Returns whether a compaction ran. */
  def maybeCompactDigestIndex(spark: org.apache.spark.sql.SparkSession,
                              path: String, maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readDigestIndexMeta(spark, path)
    if (meta.epoch - meta.digestBase + 1 >= maxEpochs) {
      compactDigestIndex(spark, path)
      true
    } else false
  }

  /** Pin a prescreen predicate to ONE FilterExec evaluation site —
    * [[graft.functions.Barrier.pin]], the repo-owned nondeterministic
    * identity. The wrapped predicate is neither pushed into a scan's
    * DataFilters (the PlanAuditSpec double-eval class) nor lifted into
    * a constraint that join-key inference would copy onto the STORED
    * side — where it would re-evaluate the kernel over every stored
    * row for nothing (stored keys pass their own bloom by
    * construction). Earlier rounds pinned via always-false
    * nondeterministic disjuncts (`rand() < -1`, then
    * `monotonically_increasing_id() < -1` after Spark 4 learned to
    * bound-fold rand comparisons); the dedicated barrier removes the
    * dependence on which builtins the optimizer learns to fold. The
    * other bloom probes get their barrier for free from a
    * Generate/mapPartitions operator below the filter; a probe over a
    * bare projection (this one) has no such operator. Cost: zero —
    * the barrier code-generates as its child. */
  private def pinToFilter(pred: Column): Column =
    graft.functions.Barrier.pin(pred)

  /** Probe a stored digest index: (probe_id, content_hash) for every
    * probe row whose content digest exists in the stored window. Each
    * probe digest prescreens against the bloom (codegen'd, map-side — a
    * novel document dies before any exchange; no false negatives, so
    * nothing true is lost), survivors verify by semi-join against the
    * stored digests. The coalesce mirrors [[digestIndex]]: it marks the
    * key non-nullable so the join's null-intolerance cannot push an
    * isnotnull(md5(content)) — a full second hash of the batch — into
    * the scan. Unlike the anti-join form, an equi-join CAN match the
    * "" sentinel against a stored sentinel (a null-text history doc),
    * which would diverge from [[dedupAgainstIndex]]'s null-never-joins
    * semantics — so the sentinel is excluded inside the same pinned
    * filter: a null-text probe matches nothing, exactly as the
    * caller-owned path has it. */
  def probeDigestIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, batch: DataFrame, contentCol: String,
                       idCol: String): DataFrame = {
    val meta = readDigestIndexMeta(spark, path)
    val words = MetaIO.readBloomWords(spark,
      s"${digestDerivedDir(path, meta.epoch)}/bloom", meta.bloomBits)
    val stored = readStoredDigests(spark, path, meta)
    batch.select(col(idCol).as("probe_id"),
        coalesce(digest(col(contentCol)), lit("")).as("content_hash"))
      .filter(pinToFilter(
        col("content_hash") =!= lit("") &&
          graft.functions.BloomFilter.mightContainCol(
            xxhash64(col("content_hash")), words, meta.bloomHashes,
            meta.bloomBits)))
      .join(stored, Seq("content_hash"), "left_semi")
      .select(col("probe_id"), col("content_hash"))
  }

  /** Measured bloom-prescreen pass ratio for a probe batch against a
    * stored digest index — the cost observability the capacity WARN
    * predicts ([[graft.pipeline.MultimodalOps.mediaBloomPassStats]]'s
    * digest twin): (passed, total) probe digests. True duplicates
    * always pass (no false negatives); the pass ratio among NOVEL
    * digests is the bloom's false-positive rate — the fraction of the
    * batch that needlessly reaches the semi-join's exchange. */
  def digestBloomPassStats(spark: org.apache.spark.sql.SparkSession,
                           path: String, probes: DataFrame,
                           contentCol: String): (Long, Long) = {
    val meta = readDigestIndexMeta(spark, path)
    val words = MetaIO.readBloomWords(spark,
      s"${digestDerivedDir(path, meta.epoch)}/bloom", meta.bloomBits)
    val row = probes
      .select(coalesce(digest(col(contentCol)), lit("")).as("__ch"))
      .agg(count(lit(1)).as("total"),
        count(when(graft.functions.BloomFilter.mightContainCol(
          xxhash64(col("__ch")), words, meta.bloomHashes, meta.bloomBits),
          1)).as("passed"))
      .collect()(0)
    (row.getLong(1), row.getLong(0))
  }

  /** Incremental exact dedup against a STORED index —
    * [[dedupAgainstIndex]] with the history consulted through the
    * artifact's bloom + window instead of a caller-owned relation: drop
    * batch rows whose content already appears in the index, then dedup
    * the survivors within the batch (keep min id). The matched-id set
    * from the probe is duplicate-sized (usually small — AQE broadcasts
    * it), so the batch itself is never shuffled on the digest. */
  def dedupExactAgainstStoredIndex(spark: org.apache.spark.sql.SparkSession,
                                   path: String, batch: DataFrame,
                                   contentCol: String,
                                   idCol: String): DataFrame = {
    val dupIds = probeDigestIndex(spark, path, batch, contentCol, idCol)
      .select(col("probe_id")).distinct()
    val fresh = batch.join(dupIds, batch(idCol) === col("probe_id"),
      "left_anti")
    dedupExact(fresh, contentCol, idCol)
  }

  /** Persistable NEAR-dup index of a corpus snapshot: (id, MinHash
    * signature) for every doc with a real shingle set — the narrow
    * artifact tomorrow's crawl screens against without re-reading
    * today's text. Empty-shingle docs are excluded (all-sentinel
    * signatures both band-collide quadratically and cannot be true
    * near-dups). Write it out bucketed by id at scale; it is
    * numHashes longs per doc regardless of document size. */
  def minhashSigIndex(df: DataFrame, textCol: String, idCol: String,
                      shingleK: Int = 3, numHashes: Int = 12): DataFrame =
    withMinhashSignature(df.filter(hasShingles(textCol, shingleK)),
        textCol, idCol, "sig", shingleK, numHashes)
      .select(col(idCol), col("sig"))

  /** Incremental NEAR-dup screen: flag batch docs whose MinHash
    * signature agrees with some indexed doc's on at least
    * `minAgreeFrac` of the permutations (the standard unbiased Jaccard
    * estimator — the snapshot's raw text is never re-read, so the
    * verify step runs on signatures, not shingle sets). Candidates come
    * from an LSH band equi-join between the batch's band keys and band
    * keys derived MAP-ONLY from the index signatures; only band-
    * colliding pairs are scored. Returns flagged pairs
    * (new_id, old_id, n_agree, agree_frac). Hot-band skew is capped the
    * same way as [[minhashCandidatePairs]], on the INDEX side (history
    * is the big side; the join's per-bucket cost is |batch bucket| ×
    * |index bucket|): index band keys whose bucket exceeds
    * `maxBandFreq` are dropped from the screen — buckets that large are
    * boilerplate, and the ORACLE mirrors the cap. A batch doc can still
    * match the same history doc through its other bands. Drop flagged
    * docs with [[dedupNearAgainstIndex]].
    *
    * A Bloom bitmap over the INDEX band keys (`bloomBits` bits, built
    * once at planning time — the same distributed build as
    * `contaminationScreenBloom`) pre-screens the batch band keys
    * MAP-SIDE before the equi-join. Bit-identical output: blooms have
    * no false negatives and the equi-join re-verifies every bloom
    * positive, so the oracle is unchanged. The point is the daily-crawl
    * regime where the index band-key side outgrows broadcast: the join
    * degrades to a shuffle, and the bloom keeps the batch side of that
    * shuffle proportional to the actual band overlap (+ ~2% fpp noise)
    * instead of to the crawl. */
  def nearDupAgainstIndex(batch: DataFrame, index: DataFrame,
                          textCol: String, idCol: String,
                          shingleK: Int = 3, numHashes: Int = 12,
                          bands: Int = 4,
                          minAgreeFrac: Double = 0.5,
                          maxBandFreq: Int = DefaultMaxBandFreq,
                          bloomBits: Int = 1 << 20,
                          bloomHashes: Int = 4): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val iSigs = index.select(col(idCol).as("old_id"), col("sig").as("old_sig"))
    // ONE pass over the index derives everything small: the distinct
    // band keys with frequencies feed BOTH the hot-band cap and the
    // bloom build (a bloom over distinct keys is bit-identical to one
    // over all occurrences — bit_or is idempotent). The checkpoint is
    // narrow (two longs + a count per DISTINCT key), so the index-side
    // signature pipeline now runs twice (key pass + join side), not
    // three times — and with a PERSISTED index
    // ([[writeMinhashIndex]] / [[nearDupAgainstStoredIndex]]) this
    // relation is read from storage and the index pipeline never
    // re-runs at all.
    val keyCounts =
      iSigs.select(posexplode(lshBandKeys(col("old_sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash")))
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(count(lit(1)).as("__hb_c"))
        .localCheckpoint()
    // built over the PRE-cap distinct index keys: a superset of the
    // capped set only adds fpp
    val bits = graft.functions.BloomFilter.build(
      keyCounts.select(bloomKey(col("band_idx"), col("band_hash")).as("__bk")),
      "__bk", bloomBits, bloomHashes)
    screenAgainstSignatures(batch, textCol, idCol, iSigs, keyCounts,
      bits, shingleK, numHashes, bands, minAgreeFrac, maxBandFreq,
      bloomBits, bloomHashes)
  }

  /** The screen shared by the in-memory and persisted index paths:
    * batch text → signatures → band keys (map-only), bloom-prescreened
    * with the caller-supplied bitmap `bits` (computed over the distinct
    * index band keys — or LOADED from the stored artifact), then an
    * equi-join against the per-doc index band keys derived MAP-ONLY
    * from the (old_id, old_sig) relation `iSigs`, with the hot-band cap
    * from the distinct-band-key relation `keyCounts` (band_idx,
    * band_hash, __hb_c), scored on full-signature agreement. Both
    * callers pass the SAME relations (one computed, one read from
    * storage), so stored-key and recomputed-key screens are identical
    * by construction — pinned by CorpusToolsSpec. */
  private def screenAgainstSignatures(batch: DataFrame, textCol: String,
                                      idCol: String, iSigs: DataFrame,
                                      keyCounts: DataFrame,
                                      bits: Array[Long],
                                      shingleK: Int, numHashes: Int,
                                      bands: Int, minAgreeFrac: Double,
                                      maxBandFreq: Int, bloomBits: Int,
                                      bloomHashes: Int): DataFrame = {
    import graft.functions.BloomFilter
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    require(maxBandFreq >= 2, s"maxBandFreq must be >= 2, got $maxBandFreq")
    val rowsPerBand = numHashes / bands
    val bSig = withMinhashSignature(batch.filter(hasShingles(textCol, shingleK)),
        textCol, idCol, "__nb_sig", shingleK, numHashes)
      .select(col(idCol).as("new_id"), col("__nb_sig").as("new_sig"))
    val bBands = bSig.select(col("new_id"), col("new_sig"),
      posexplode(lshBandKeys(col("new_sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    val iBandsAll = iSigs.select(col("old_id"), col("old_sig"),
      posexplode(lshBandKeys(col("old_sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    val iBands =
      if (maxBandFreq == Int.MaxValue) iBandsAll
      else {
        val hot = keyCounts.filter(col("__hb_c") > maxBandFreq)
          .select(col("band_idx"), col("band_hash"))
        iBandsAll.join(hot, Seq("band_idx", "band_hash"), "left_anti")
      }
    val bScreened = bBands.filter(BloomFilter.mightContainCol(
      bloomKey(col("band_idx"), col("band_hash")), bits, bloomHashes, bloomBits))
    bScreened.join(iBands, Seq("band_idx", "band_hash"))
      .select(col("new_id"), col("old_id"),
        size(filter(zip_with(col("new_sig"), col("old_sig"),
          (x, y) => x === y), b => b)).cast("long").as("n_agree"))
      .distinct()
      .withColumn("agree_frac", col("n_agree").cast("double") / numHashes)
      .filter(col("agree_frac") >= minAgreeFrac)
  }

  /** The bloom key both screen sides fold a (band_idx, band_hash) pair
    * into — one bigint, computed identically everywhere, so the bloom
    * cannot lose a true collision. */
  private[graft] def bloomKey(idx: Column, hash: Column): Column = xxhash64(idx, hash)

  /** Persist a MinHash signature index as an on-disk serving artifact:
    *
    *   - `path/signatures/e<N>` — (id, sig): [[minhashSigIndex]]'s
    *     output, numHashes longs per doc, in epoch dirs under a RANGE
    *     pointer ([sig_base, epoch] in meta): one immutable delta dir
    *     per append, re-based by [[compactMinhashIndex]];
    *   - `path/derived/e<N>/bandkeys` — (band_idx, band_hash, freq):
    *     the DISTINCT band-key relation with bucket frequencies,
    *     derived from the stored signatures;
    *   - `path/derived/e<N>/bloom` — (word_idx, word): the PRE-BUILT
    *     bloom bitmap over the distinct band keys (≤ bloomBits/64
    *     longs — 128 KB at the default 2^20 bits);
    *   - `path/meta` — ONE row that is both the geometry pin
    *     (shingle_k, num_hashes, bands, bloom_bits, bloom_hashes) and
    *     the CONSISTENCY POINTER: `epoch` names the derived-relation
    *     directory probes must read, `sig_count` records how many
    *     signature rows that epoch covers.
    *
    * The epoch pointer is what makes appends probe-safe: derived
    * relations are IMMUTABLE once written (a new epoch directory per
    * append, never an in-place overwrite), meta swaps via
    * write-sideways + rename LAST ([[LayoutOps.compactPartitioned]]'s
    * pattern, same documented non-transactional seam), and a probe
    * resolves its epoch from meta ONCE, so it reads a consistent
    * (bandkeys, bloom) snapshot — either the old epoch or the new one,
    * never a half-rewritten mix. Signatures live under the same
    * discipline: a probe's window [sig_base, epoch] resolves from the
    * SAME meta read as its derived epoch, so signatures, bandkeys, and
    * bloom are always one consistent snapshot — an append or
    * compaction landing mid-probe changes nothing the probe can see
    * (superseded generations get one commit's grace before the
    * janitor).
    *
    * [[nearDupAgainstStoredIndex]] then LOADS the bloom bitmap and
    * reads the hot-band cap from the stored key relation and its join
    * side map-only from the STORED signatures, so the daily-crawl
    * screen is a pure read: index text is never re-read, the signature
    * kernel never re-runs, and no bitmap-building job runs at probe
    * time. Same build/probe split as the IVF-PQ index
    * ([[SimilarityOps.writeIvfPqIndex]]). The band-key derivation
    * reads the just-written signature epoch BACK rather than reusing
    * the un-persisted plan, so the corpus text pipeline runs exactly
    * once. */
  def writeMinhashIndex(df: DataFrame, textCol: String, idCol: String,
                        path: String, shingleK: Int = 3,
                        numHashes: Int = 12, bands: Int = 4,
                        bloomBits: Int = 1 << 20,
                        bloomHashes: Int = 4): Unit =
    buildMinhashIndex(df, textCol, idCol, path, shingleK, numHashes,
      bands, bloomBits, bloomHashes, lastBatchId = -1L)

  private def buildMinhashIndex(df: DataFrame, textCol: String,
                                idCol: String, path: String,
                                shingleK: Int, numHashes: Int, bands: Int,
                                bloomBits: Int, bloomHashes: Int,
                                lastBatchId: Long): Unit = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val spark = df.sparkSession
    minhashSigIndex(df, textCol, idCol, shingleK, numHashes)
      .select(col(idCol).as("id"), col("sig"))
      .write.mode("overwrite").parquet(minhashSigDir(path, 0L))
    val stored = spark.read.parquet(minhashSigDir(path, 0L))
    val sigCount = stored.count()
    val meta = MinhashIndexMeta(shingleK, numHashes, bands, bloomBits,
      bloomHashes, epoch = 0L, sigCount = sigCount,
      lastBatchId = lastBatchId)
    rebuildDerivedRelations(spark, path, meta, meta.epoch, stored)
    warnIfMinhashBloomSaturated(path, sigCount, bands, bloomBits)
    swapMeta(spark, path, meta)
  }

  /** The artifact's meta row: geometry pin + epoch consistency pointer
    * + the signature window's base ([sig_base, epoch] — the range
    * pointer [[compactMinhashIndex]] re-bases) + the last applied
    * streaming batch id ([[ingestMinhashBatch]]; -1 = never
    * stream-fed, batch-API appends leave it untouched). */
  private[graft] final case class MinhashIndexMeta(
      shingleK: Int, numHashes: Int, bands: Int, bloomBits: Int,
      bloomHashes: Int, epoch: Long, sigCount: Long, sigBase: Long = 0L,
      lastBatchId: Long = -1L)

  private[graft] def readMinhashIndexMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): MinhashIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "minhash index", "index")
    MinhashIndexMeta(r.getAs[Int]("shingle_k"), r.getAs[Int]("num_hashes"),
      r.getAs[Int]("bands"), r.getAs[Int]("bloom_bits"),
      r.getAs[Int]("bloom_hashes"), r.getAs[Long]("epoch"),
      r.getAs[Long]("sig_count"),
      // a meta with no sig_base is the PRE-round-16 FLAT layout
      // (signatures as loose part files, not epoch dirs) — a default
      // would send every read to signatures/e<N> paths that don't
      // exist. Refuse with the migration instead of a path error.
      if (r.schema.fieldNames.contains("sig_base"))
        r.getAs[Long]("sig_base")
      else throw new IllegalStateException(
        s"minhash index at $path uses the legacy FLAT signature " +
          "layout (no sig_base in meta); this build reads epoch'd " +
          "windows only — rebuild via writeMinhashIndex, or migrate by " +
          "moving the loose signature files into signatures/e0 and " +
          "adding sig_base=0 to meta"),
      // pre-streaming-format meta has no batch pointer: never-stream-fed
      if (r.schema.fieldNames.contains("last_batch_id"))
        r.getAs[Long]("last_batch_id")
      else -1L)
  }

  /** The derived-relation directory for one epoch (immutable once
    * written). */
  private[graft] def minhashDerivedDir(path: String, epoch: Long): String =
    s"$path/derived/e$epoch"

  /** One signature epoch's directory — the stored signatures live in
    * epoch'd subdirectories under a RANGE pointer ([sig_base, epoch]
    * in meta, the WARC index's layout): each append lands its delta as
    * ONE fresh immutable dir instead of `mode("append")` file-sets
    * into a flat relation, so a torn append's orphan rows are
    * INVISIBLE (the window never covers an unswapped epoch) and
    * compaction is an ordinary epoch commit with no delete-and-rename
    * of a live relation under racing probes. */
  private[graft] def minhashSigDir(path: String, epoch: Long): String =
    s"$path/signatures/e$epoch"

  /** The index's visible signature snapshot: the union of the meta
    * window's epoch dirs, resolved from ONE meta read. */
  private[graft] def readStoredSignatures(
      spark: org.apache.spark.sql.SparkSession, path: String,
      meta: MinhashIndexMeta): DataFrame =
    spark.read.parquet(
      (meta.sigBase to meta.epoch).map(minhashSigDir(path, _)): _*)

  /** Swap the meta pointer: write sideways, then delete + rename — the
    * [[LayoutOps.compactPartitioned]] seam. Meta commits LAST in every
    * lifecycle step, so an interrupted build/append leaves the old
    * pointer (or nothing) in place and the artifact reads as its
    * previous consistent state; `sig_count` then disagrees with the
    * stored signatures and the next append self-heals with a full
    * derived rebuild. */
  private def swapMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String, meta: MinhashIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "minhash index",
      Seq((meta.shingleK, meta.numHashes, meta.bands, meta.bloomBits,
          meta.bloomHashes, meta.epoch, meta.sigCount, meta.sigBase,
          meta.lastBatchId))
        .toDF("shingle_k", "num_hashes", "bands", "bloom_bits",
          "bloom_hashes", "epoch", "sig_count", "sig_base",
          "last_batch_id"))
  }

  /** Loud saturation guard — the decontamination index's capacity WARN
    * ported to this bloom: past ~numBits/10 inserted band keys the
    * prescreen's false-positive rate climbs toward pass-everything;
    * correctness holds (the agreement join re-verifies) but every
    * probe quietly pays the shuffle the bloom exists to skip. The
    * remedy is a rebuild with a larger bloomBits. Checked against the
    * INSERT-count upper bound sigCount × bands (the media-hash
    * discipline — both counts are already on hand, so the WARN costs
    * nothing): distinct keys ≤ inserted keys, so the guard can fire a
    * little early on duplicate-heavy corpora, never late. */
  private def warnIfMinhashBloomSaturated(path: String, sigCount: Long,
                                          bands: Int, numBits: Int): Unit = {
    val inserted = sigCount * bands
    val capacity = numBits / 10L
    if (inserted > capacity)
      System.err.println(
        s"[graft] minhash index at $path: $sigCount stored signatures " +
          s"x $bands bands = $inserted bloom keys exceed the " +
          s"$numBits-bit bloom's design capacity (~$capacity at 10 " +
          "bits/element) — the prescreen's false-positive rate is " +
          "degrading toward pass-everything; rebuild with " +
          "writeMinhashIndex and a larger bloomBits")
  }

  /** Full rebuild of one epoch's derived relations from the given
    * signature snapshot — the build path and the append self-heal
    * path. Scans the narrow (id, sig) relation only (numHashes longs
    * per doc): corpus text is never touched. The bloom derivation
    * reads the just-written bandkeys BACK so the signature scan runs
    * once. */
  private def rebuildDerivedRelations(
      spark: org.apache.spark.sql.SparkSession, path: String,
      meta: MinhashIndexMeta, epoch: Long, sigs: DataFrame): Unit = {
    val rowsPerBand = meta.numHashes / meta.bands
    val dir = minhashDerivedDir(path, epoch)
    sigs
      .select(posexplode(lshBandKeys(col("sig"), meta.bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("freq"))
      .write.mode("overwrite").parquet(s"$dir/bandkeys")
    val bits = graft.functions.BloomFilter.build(
      spark.read.parquet(s"$dir/bandkeys")
        .select(bloomKey(col("band_idx"), col("band_hash")).as("__bk")),
      "__bk", meta.bloomBits, meta.bloomHashes)
    writeBloomWords(spark, bits, dir)
  }

  private def writeBloomWords(spark: org.apache.spark.sql.SparkSession,
                              bits: Array[Long], dir: String): Unit =
    MetaIO.writeBloomWords(spark, bits, s"$dir/bloom")

  /** Append today's crawl to a [[writeMinhashIndex]] artifact — the
    * daily maintenance move completing the build/append/probe lifecycle
    * (the IVF-PQ precedent, [[SimilarityOps.appendIvfPqIndex]]): new
    * docs are signed against the artifact's PINNED geometry (from
    * meta — appends cannot drift the hash family), their signatures
    * land as ONE fresh epoch dir under `path/signatures/e<N>` (never
    * interleaved into a live relation), and the derived relations land
    * in a NEW epoch directory by DELTA-MERGE — band-key counts are
    * sum-mergeable and the bloom OR-idempotent, so the new epoch is
    * built from the delta's band keys plus the previous epoch's stored
    * relations. Append cost is proportional to the DELTA (plus a
    * bandkeys-sized merge, bounded by distinct band keys), never a
    * rescan of all stored signatures. Spec-pinned: append ≡ one-shot
    * build over the union, relation for relation and bloom bit for
    * bit.
    *
    * Probe safety and crash recovery: the new epoch writes BEFORE the
    * meta pointer swaps (meta commits LAST), the previous derived
    * epoch's directory survives one more append (in-flight probes that
    * resolved it keep a consistent snapshot; epochs older than the
    * previous are pruned). A torn append — the delta's signature epoch
    * landed, meta didn't — is simply INVISIBLE (the window never
    * covers an unswapped epoch) and the retry overwrites the orphan
    * dir wholesale, so nothing is double-counted or silently
    * surfaced. */
  def appendMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, df: DataFrame, textCol: String,
                         idCol: String): Unit = {
    val meta = readMinhashIndexMeta(spark, path)
    appendMinhashCore(spark, path, meta, df, textCol, idCol,
      meta.lastBatchId)
  }

  private def appendMinhashCore(spark: org.apache.spark.sql.SparkSession,
                                path: String, meta: MinhashIndexMeta,
                                df: DataFrame, textCol: String,
                                idCol: String, lastBatchId: Long): Unit = {
    val stored = readStoredSignatures(spark, path, meta)
    // the meta window covering exactly sig_count rows is the layout
    // invariant (a torn append's orphan epoch sits OUTSIDE the window);
    // on a mismatch — manual surgery on the dirs — the derived
    // relations rebuild from the full visible snapshot instead of
    // delta-merging. Defense in depth, never the hot path.
    val storedCount = stored.count()
    val healthy = storedCount == meta.sigCount
    val rowsPerBand = meta.numHashes / meta.bands
    // ids already signed are SKIPPED — the anti-join runs on the
    // narrow stored id column BEFORE any text is shingled, so a
    // re-dropped segment (a retried orchestration step, a twice-landed
    // crawl day) is an idempotent no-op instead of duplicating its
    // signature rows (which would inflate sig_count, double band-key
    // frequencies, and double-emit its near-dup candidates). The
    // delta signatures then feed the epoch write AND (healthy path)
    // the band-key delta — checkpointed so the batch text signs once.
    val fresh = df.join(
      stored.select(col("id").as("__mh_seen")),
      df(idCol) === col("__mh_seen"), "left_anti")
    val delta = minhashSigIndex(fresh, textCol, idCol, meta.shingleK,
        meta.numHashes)
      .select(col(idCol).as("id"), col("sig"))
      .localCheckpoint()
    try {
      val deltaCount = delta.count()
      val next = meta.epoch + 1
      // ONE fresh epoch dir per append, mode("overwrite"): a retried
      // append lands on the same epoch number and replaces a torn
      // attempt's (invisible) orphan dir wholesale
      delta.write.mode("overwrite").parquet(minhashSigDir(path, next))
      val nextDir = minhashDerivedDir(path, next)
      if (healthy) {
        val deltaKeys = delta
          .select(posexplode(lshBandKeys(col("sig"), meta.bands, rowsPerBand))
            .as(Seq("band_idx", "band_hash")))
          .groupBy(col("band_idx"), col("band_hash"))
          .agg(count(lit(1)).as("freq"))
          .localCheckpoint() // consumed twice: count merge + bloom delta
        try {
          spark.read.parquet(s"${minhashDerivedDir(path, meta.epoch)}/bandkeys")
            .unionByName(deltaKeys)
            .groupBy(col("band_idx"), col("band_hash"))
            .agg(sum(col("freq")).as("freq"))
            .write.mode("overwrite").parquet(s"$nextDir/bandkeys")
          val deltaBits = graft.functions.BloomFilter.build(
            deltaKeys.select(bloomKey(col("band_idx"), col("band_hash")).as("__bk")),
            "__bk", meta.bloomBits, meta.bloomHashes)
          val merged = readStoredBloom(spark, path, meta)
          var i = 0
          while (i < merged.length) { merged(i) |= deltaBits(i); i += 1 }
          writeBloomWords(spark, merged, nextDir)
        } finally deltaKeys.unpersist()
      } else {
        val all = spark.read.parquet(
          (meta.sigBase to next).map(minhashSigDir(path, _)): _*)
        rebuildDerivedRelations(spark, path, meta, next, all)
      }
      warnIfMinhashBloomSaturated(path, storedCount + deltaCount,
        meta.bands, meta.bloomBits)
      swapMeta(spark, path,
        meta.copy(epoch = next, sigCount = storedCount + deltaCount,
          lastBatchId = lastBatchId))
      // derived epochs keep {current, superseded}; the SIGNATURE
      // epochs are the window itself — only compaction re-bases them
      pruneEpochs(spark, path, superseded = meta.epoch)
      // the per-day maintenance path must not accumulate one
      // checkpointed RDD per append for the session's lifetime
    } finally delta.unpersist()
  }

  /** The near-dup index's STREAMING maintenance leg — each micro-batch
    * of landed documents commits through here with its batch id
    * recorded behind the meta swap (the
    * [[graft.pipeline.WarcOps.ingestWarcIndexBatch]] discipline), so a
    * daily crawl's text keeps the stored signature index current
    * without hand-run appends and every later segment's screen
    * ([[nearDupAgainstStoredIndex]]) sees all of history. The stored-id
    * anti-join already makes replays DATA no-ops; the pointer spares
    * them the signature kernel and the empty epoch commit. First batch
    * on an empty path builds the artifact (geometry applies ONLY then —
    * an existing index's meta pins its own); a torn meta swap is
    * RECOVERED, signature epochs with no recoverable meta are refused
    * loudly. Returns whether the batch was applied.
    *
    * SINGLE-WRITER, NON-DECREASING batch ids: a replay at or one below
    * the stored pointer skips quietly (the crash-replay signature); an
    * id regressing further is a reset checkpoint or a second
    * maintainer and REFUSES loudly, naming the backfill
    * ([[appendMinhashIndex]], which has no pointer and always
    * anti-joins). */
  def ingestMinhashBatch(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame, textCol: String,
                         idCol: String, batchId: Long, shingleK: Int = 3,
                         numHashes: Int = 12, bands: Int = 4,
                         bloomBits: Int = 1 << 20,
                         bloomHashes: Int = 4): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "minhash index",
        s"$path/signatures")
      buildMinhashIndex(batch, textCol, idCol, path, shingleK, numHashes,
        bands, bloomBits, bloomHashes, lastBatchId = batchId)
      true
    } else {
      val meta = readMinhashIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("minhash index", path,
          batchId, meta.lastBatchId, "documents", "appendMinhashIndex")
        false // replayed batch: no-op
      } else {
        appendMinhashCore(spark, path, meta, batch, textCol, idCol,
          batchId)
        true
      }
    }
  }

  /** Compact the signature window: rewrite the [sig_base, epoch] union
    * as ONE fresh epoch at `targetFiles` and re-base the pointer onto
    * it — [[graft.pipeline.WarcOps.compactWarcIndex]]'s move. Without
    * it a daily-append index accumulates one parquet file-set per
    * append in the relation every probe scans (the tiny-files problem
    * the other lifecycles' compaction steps exist to solve). The
    * derived relations rebuild from the compacted snapshot into a
    * fresh epoch (bit-identical by construction — same signatures),
    * meta swaps last, and the janitor prunes signature generations
    * below the OLD base (one generation's grace for a racing probe
    * that resolved the old meta) plus derived epochs below the old
    * pointer. Probe output is byte-identical before and after — only
    * the file layout moves. Grace is ONE commit, sized for batch
    * probes: a LONG-LIVED reader that pinned its window at
    * construction (the stored-index flags STREAM) outlives it once a
    * later compaction prunes the dirs — restart such readers at least
    * once per compaction cycle (their scaladoc states it). */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readMinhashIndexMeta(spark, path)
    val next = meta.epoch + 1
    readStoredSignatures(spark, path, meta).coalesce(targetFiles)
      .write.mode("overwrite").parquet(minhashSigDir(path, next))
    val compacted = spark.read.parquet(minhashSigDir(path, next))
    rebuildDerivedRelations(spark, path, meta, next, compacted)
    val total = compacted.count()
    warnIfMinhashBloomSaturated(path, total, meta.bands, meta.bloomBits)
    swapMeta(spark, path,
      meta.copy(epoch = next, sigBase = next, sigCount = total))
    pruneEpochs(spark, path, superseded = meta.epoch)
    MetaIO.pruneEpochs(spark, Seq(s"$path/signatures"),
      superseded = meta.sigBase)
  }

  /** Compact when the live signature window has grown to `maxEpochs`
    * dirs or more — the policy wrapper for orchestrated daily appends
    * ([[graft.pipeline.WarcOps.maybeCompactWarcIndex]]'s contract).
    * Returns whether a compaction ran. */
  def maybeCompactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                               path: String, maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readMinhashIndexMeta(spark, path)
    if (meta.epoch - meta.sigBase + 1 >= maxEpochs) {
      compactMinhashIndex(spark, path)
      true
    } else false
  }

  /** Remove derived-relation epochs older than the SUPERSEDED one —
    * that one stays for one append's grace (in-flight probes),
    * everything older goes. Shared GC in [[MetaIO.pruneEpochs]] (ported
    * to the LM / k-means / decontamination / HLL lifecycles in round
    * 11; this was the original). */
  private def pruneEpochs(spark: org.apache.spark.sql.SparkSession,
                          path: String, superseded: Long): Unit =
    MetaIO.pruneEpochs(spark, Seq(s"$path/derived"), superseded)

  /** The current epoch's stored bloom bitmap, back in probe shape —
    * bloomBits/64 longs, a scalar-sized collect like the IVF centroid
    * snapshot. */
  private[graft] def readStoredBloom(spark: org.apache.spark.sql.SparkSession,
                              path: String, meta: MinhashIndexMeta): Array[Long] =
    MetaIO.readBloomWords(spark,
      s"${minhashDerivedDir(path, meta.epoch)}/bloom", meta.bloomBits)

  /** Incremental NEAR-dup screen against a [[writeMinhashIndex]]
    * artifact — semantics identical to [[nearDupAgainstIndex]] (same
    * core, pinned by spec), but every index-side input comes from
    * storage: the PRE-BUILT bloom bitmap from `path/bloom` (a 128 KB
    * read at the default 2^20 bits — no bitmap-building job at probe
    * time), hot-band cap from `path/bandkeys`, join side map-only from
    * `path/signatures`. Geometry AND bloom parameters come from
    * `path/meta` — the probe CANNOT mismatch the build (same
    * pinned-quantizer discipline as the IVF-PQ probe), which is why
    * those parameters are absent here. */
  def nearDupAgainstStoredIndex(spark: org.apache.spark.sql.SparkSession,
                                path: String, batch: DataFrame,
                                textCol: String, idCol: String,
                                minAgreeFrac: Double = 0.5,
                                maxBandFreq: Int = DefaultMaxBandFreq): DataFrame = {
    // the epoch resolves ONCE here, so signatures, bandkeys, and bloom
    // all come from the same immutable snapshot even if an append or a
    // compaction lands mid-probe
    val meta = readMinhashIndexMeta(spark, path)
    val iSigs = readStoredSignatures(spark, path, meta)
      .select(col("id").as("old_id"), col("sig").as("old_sig"))
    val keyCounts = spark.read
      .parquet(s"${minhashDerivedDir(path, meta.epoch)}/bandkeys")
      .select(col("band_idx"), col("band_hash"), col("freq").as("__hb_c"))
    val bits = readStoredBloom(spark, path, meta)
    screenAgainstSignatures(batch, textCol, idCol, iSigs, keyCounts,
      bits, meta.shingleK, meta.numHashes, meta.bands, minAgreeFrac,
      maxBandFreq, meta.bloomBits, meta.bloomHashes)
  }

  /** Drop every batch doc flagged by [[nearDupAgainstIndex]]; in-batch
    * near-dups are then handled by composing [[dedupNearMinhash]] over
    * the survivors (separate concerns: history screen vs intra-batch). */
  def dedupNearAgainstIndex(batch: DataFrame, index: DataFrame,
                            textCol: String, idCol: String,
                            shingleK: Int = 3, numHashes: Int = 12,
                            bands: Int = 4,
                            minAgreeFrac: Double = 0.5,
                            maxBandFreq: Int = DefaultMaxBandFreq): DataFrame = {
    val flagged = nearDupAgainstIndex(batch, index, textCol, idCol,
        shingleK, numHashes, bands, minAgreeFrac, maxBandFreq)
      .select(col("new_id").as("__ni_drop")).distinct()
    batch.join(flagged, col(idCol) === col("__ni_drop"), "left_anti")
  }

  /** Prime just above 2^32, the modulus of the MinHash permutation
    * family. */
  val MinhashPrime: Long = 4294967311L

  /** Cheap equivalent of the all-sentinel signature check: a doc has a
    * non-empty shingle set iff it has at least k tokens. Use THIS (on
    * the raw text) to exclude shingle-less docs, never a predicate on
    * the computed signature — a signature-column filter gets
    * substituted through the projection and pushed into the scan,
    * evaluating the whole minhash kernel a second time per row
    * (PlanAuditSpec's kernel-in-DataFilters check). `split` counts
    * empty tokens exactly like the kernel's byte-level tokenizer, and
    * null text yields null → filtered, matching the sentinel path. */
  def hasShingles(textCol: String, shingleK: Int): Column =
    size(split(col(textCol), " ")) >= shingleK

  /** Per-permutation multiplier: (2i+1)·2654435761 mod p. The multiplier
    * must WRAP the modulus many times to decorrelate the permutations —
    * a bare (2i+1) (≤ 23) wraps at most ~5×, which leaves all 12
    * "permutations" rank-correlated (the globally-minimal shingle hash
    * wins most of them), collapsing candidate recall for non-identical
    * near-dups. With h < 1e9+7 and a < p < 2^33 the product stays under
    * 2^63 on both engines. */
  def minhashA(i: Int): Long = ((2L * i + 1) * 2654435761L) % MinhashPrime
  def minhashB(i: Int): Long = 1L * i * i * 65537 + 7

  /** The same multiplier as a SQL fragment over a permutation-index
    * column expression. */
  def minhashASql(iExpr: String): String =
    s"((($iExpr * 2 + 1) * 2654435761) % $MinhashPrime)"

  /** MinHash signature via the standard affine-permutation family: one
    * rolling shingle hash per k-window (TokenShingleHash — single pass,
    * no shingle strings), then sig_i = min over shingles of
    * (h·(2i+1)·2654435761 + i²·65537 + 7) mod p. Empty shingle set →
    * all-sentinel signature (= p, above any residue).
    *
    * ONE codegen'd pass (graft.functions.MinhashSig): tokenize, hash,
    * and fold all numHashes minima over the UTF-8 bytes in a straight
    * loop. This is the kernel behind both the streaming paths and the
    * batch [[withMinhashSignature]]; earlier composable forms either
    * recomputed the shingle array once per permutation (CollapseProject
    * re-inlines a once-lexically-referenced staging alias) or paid an
    * interpreted aggregate() lambda fold per shingle — the kernel has
    * no staging to lose and no lambda frames. */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column =
    graft.functions.MinhashSig.sig(text, shingleK,
      Array.tabulate(numHashes)(minhashA), Array.tabulate(numHashes)(minhashB),
      MinhashPrime)

  /** LSH band keys: the signature split into `bands` rows-per-band chunks,
    * each hashed to one band key. Emits an array of `bands` strings. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string"))).cast("binary")))

  /** DataFrame-level signature — MAP-ONLY: one codegen'd pass per doc
    * ([[minhashSignature]] / graft.functions.MinhashSig). The earlier
    * explode → numHashes-min-columns → JOIN BACK shape existed because
    * a columnar staging of the hash array could be silently re-inlined
    * by CollapseProject (recomputing every shingle hash
    * numHashes-fold); the kernel tokenizes, hashes, and folds all
    * minima in one pass, so there is no staging to lose, no shuffle,
    * and no join — the signature depends on nothing outside the doc.
    * Null text yields the all-sentinel signature (the join-back form
    * gave the same via its left join + coalesce). Docs with fewer than
    * k tokens likewise get the sentinel. */
  def withMinhashSignature(df: DataFrame, textCol: String, idCol: String,
                           sigCol: String, shingleK: Int = 3,
                           numHashes: Int = 12): DataFrame = {
    val sentinel = array(Seq.fill(numHashes)(lit(MinhashPrime)): _*)
    df.withColumn(sigCol,
      coalesce(minhashSignature(col(textCol), shingleK, numHashes), sentinel))
  }

  /** Default ceiling on a band bucket's membership. A bucket of c docs
    * emits c·(c−1)/2 candidate pairs, so one boilerplate-concentrated
    * bucket goes quadratic long before anything else in the pipeline
    * hurts; 10⁴ caps a single bucket at ~5·10⁷ pairs. True near-dup
    * CLUSTERS above the cap don't exist in practice — a 10⁴-strong
    * "near-dup" set is boilerplate, and EXACT duplicates (which also
    * concentrate buckets) belong to the exact-dedup pass that runs
    * before near-dedup in any real pipeline. */
  val DefaultMaxBandFreq: Int = 10000

  /** Diagnostic: band buckets whose membership exceeds `maxBandFreq`,
    * with their counts — the monitoring view behind the cap below. Run
    * it when the candidate counts drop unexpectedly: a non-empty result
    * is the loud signal that banding is truncating (raise `bands`,
    * pre-filter the boilerplate, or accept the recall trade). */
  def hotBandStats(df: DataFrame, textCol: String, idCol: String,
                   shingleK: Int = 3, numHashes: Int = 12, bands: Int = 4,
                   maxBandFreq: Int = DefaultMaxBandFreq): DataFrame = {
    val rowsPerBand = numHashes / bands
    withMinhashSignature(df.filter(hasShingles(textCol, shingleK)),
        textCol, idCol, "__mh_sig", shingleK, numHashes)
      .select(posexplode(lshBandKeys(col("__mh_sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBandFreq)
  }

  /** Candidate near-dup pairs via MinHash LSH: docs sharing ≥1 band.
    * Returns (id_a, id_b) with id_a < id_b, distinct.
    *
    * Empty-shingle docs are EXCLUDED from banding: they all carry the
    * identical all-sentinel signature, so every one of them would share
    * every band key with every other — one quadratic hot bucket on a
    * real corpus (which has millions of near-empty docs). They cannot be
    * near-duplicates by Jaccard anyway (empty shingle sets), so dropping
    * them changes no true candidate. sig[0] = p iff the shingle set was
    * empty (any real shingle leaves a residue < p).
    *
    * HOT-BAND CAP, on by default: bucket frequencies are counted with
    * one map-side-combinable aggregation inside the same plan, and
    * buckets above `maxBandFreq` are dropped from banding entirely (an
    * equi anti-join — no driver round-trip, no extra job). The sentinel
    * filter killed the EMPTY-doc hot bucket; this closes the remaining
    * skew path, a boilerplate-heavy corpus concentrating one real
    * bucket quadratically. Docs in a dropped bucket still pair through
    * their other bands; pairs that agree ONLY in the hot band are the
    * deliberate recall cost, and [[hotBandStats]] is the loud
    * monitoring view of exactly what the cap is truncating. The DuckDB
    * oracles mirror the cap, so the semantics stay bit-identical at any
    * scale. `maxBandFreq = Int.MaxValue` disables. */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, numHashes: Int = 12,
                            bands: Int = 4,
                            maxBandFreq: Int = DefaultMaxBandFreq): DataFrame = {
    require(maxBandFreq >= 2, s"maxBandFreq must be >= 2, got $maxBandFreq")
    val rowsPerBand = numHashes / bands
    val withSig = withMinhashSignature(df.filter(hasShingles(textCol, shingleK)),
      textCol, idCol, "__mh_sig", shingleK, numHashes)
    val banded = withSig.select(col(idCol).as("doc_id"),
      posexplode(lshBandKeys(col("__mh_sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    val withBands =
      if (maxBandFreq == Int.MaxValue) banded
      else {
        val hot = banded.groupBy(col("band_idx"), col("band_hash"))
          .agg(count(lit(1)).as("__hb_c"))
          .filter(col("__hb_c") > maxBandFreq)
          .select(col("band_idx"), col("band_hash"))
        banded.join(hot, Seq("band_idx", "band_hash"), "left_anti")
      }
    val a = withBands.as("a"); val b = withBands.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** End-to-end near-duplicate dedup: LSH candidate pairs → exact n-gram
    * Jaccard verification → drop every doc with a verified near-dup of
    * smaller id. The decision rule is edge-local (no transitive closure /
    * connected components — at corpus scale that is a deliberate choice:
    * each drop is justified by a direct verified near-dup, and the kept
    * set is deterministic). Cost shape: banding shuffle + candidate-only
    * Jaccard joins + one left_anti — never all-pairs. */
  def dedupNearMinhash(df: DataFrame, textCol: String, idCol: String,
                       shingleK: Int = 3, numHashes: Int = 12, bands: Int = 4,
                       jaccardThreshold: Double = 0.5): DataFrame = {
    // persist the candidate set: it is referenced five times below
    // (id-set union + three joins inside ngramJaccard), and exchange
    // reuse across identical subtrees is best-effort — without this the
    // costliest stage (signature + banding + self-join) could execute
    // several times. Candidate pairs are tiny relative to the corpus.
    val cand = minhashCandidatePairs(df, textCol, idCol, shingleK, numHashes, bands)
      .persist()
    try {
      // restrict the exact-Jaccard stage to docs that appear in a candidate
      // pair BEFORE exploding shingles — ngramJaccard's distinct-shingle
      // shuffle over the full corpus would otherwise dominate the whole
      // pipeline (candidates are a vanishing fraction of a real corpus)
      val candIds = cand.select(col("id_a").as("__nd_id"))
        .unionAll(cand.select(col("id_b").as("__nd_id")))
      val candDocs = df.join(candIds, col(idCol) === col("__nd_id"), "left_semi")
      // localCheckpoint(eager) severs the drop set from the candidate
      // lineage so cand can be unpersisted NOW instead of leaking for the
      // session lifetime; the checkpoint blocks themselves are
      // ContextCleaner-managed (freed when the result frame is dropped)
      val drops = ngramJaccard(candDocs, cand, textCol, idCol, shingleK)
        .filter(col("jaccard") >= jaccardThreshold)
        .select(col("id_b").as("__nd_drop")).distinct()
        .localCheckpoint()
      df.join(drops, col(idCol) === col("__nd_drop"), "left_anti")
    } finally cand.unpersist()
  }

  /** Connected components over an undirected pair relation via
    * min-label propagation: every node ends up labeled with the smallest
    * id reachable from it. Iterative relational shape — per round, one
    * join + groupBy-min + label merge, `localCheckpoint` to keep plans
    * flat (the k-means trick) — converges in graph-diameter rounds;
    * near-dup graphs are shallow (dup clusters are cliques-ish), so this
    * is a handful of tiny jobs over the candidate set only, never the
    * corpus. Returns (id, component) for every id appearing in pairs.
    * The returned frame is persisted (it holds the converged state);
    * the caller owns the matching unpersist(). Rounds are capped at
    * `maxRounds` — a graph whose diameter exceeds the cap fails loudly
    * instead of returning partially-propagated labels. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 64,
                          onConverged: Int => Unit = _ => ()): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // persist (not localCheckpoint): recomputable on executor loss, and
    // each round unpersists the previous round's blocks, so executor
    // storage stays at one labels-set regardless of chain length.
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var round = 0
    var ok = false
    val checkpointEvery = 8 // rounds between lineage truncations
    val spark = pairs.sparkSession
    try {
      while (changed > 0 && round < maxRounds) {
        round += 1
        val prop = edges.join(labels, col("b") === col("id"))
          .groupBy(col("a")).agg(min(col("component")).as("nc"))
        val joined = labels.join(prop, labels("id") === prop("a"), "left")
          .select(labels("id"),
            least(col("component"), coalesce(col("nc"), col("component"))).as("component"))
        // FLATTEN the per-round plan: `labels` appears TWICE in `joined`
        // (inside prop and as the outer join's left side), so nesting on
        // the previous round's plan DOUBLES the tree each round —
        // 2^rounds copies of the pairs subtree; a deep graph OOM'd the
        // driver merely rendering the cache-name plan string. Rebuilding
        // from the RDD gives a flat LogicalRDD plan (execution unchanged;
        // fault tolerance moves to the RDD DAG, which shares nodes by
        // reference instead of copying trees).
        // The flat RDD lineage still CHAINS linearly across rounds (an
        // executor loss in round r recomputes through every earlier
        // round's join). Truncate it with an eager localCheckpoint every
        // few rounds: the narrow exposure (losing a checkpointed block's
        // executor forfeits recompute for that block) is a fair trade
        // against an O(rounds) recompute tail on deep graphs; most real
        // dedup graphs converge well under the interval and never hit it.
        val flat = spark.createDataFrame(joined.rdd, joined.schema)
        val next =
          if (round % checkpointEvery == 0) flat.localCheckpoint(true)
          else flat.persist(StorageLevel.MEMORY_AND_DISK)
        changed = next.as("n")
          .join(labels.select(col("id"), col("component").as("old")), "id")
          .filter(col("component") =!= col("old")).count() // materializes next
        labels.unpersist()
        labels = next
      }
      // a pathological chain graph (diameter > maxRounds) must fail loudly
      // rather than return silently-wrong components
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds " +
            s"($changed labels still changing) — graph diameter exceeds the cap")
      onConverged(round)
      ok = true
      labels
    } finally {
      edges.unpersist()
      // on ANY failure path (non-convergence throw, mid-round job
      // failure) the current labels frame must not leak its blocks;
      // on success the caller owns the returned persisted frame
      if (!ok) labels.unpersist()
    }
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — converges in O(log n) rounds regardless of graph
    * DIAMETER, where [[connectedComponents]]' min-label propagation
    * needs diameter-many rounds (a 10k-link chain of near-identical
    * crawl snapshots would blow its round cap; this one finishes in
    * ~15 rounds).
    *
    * Per round: large-star hangs every node's larger neighbors off its
    * minimum (one groupBy + one join on the node id), small-star does
    * the same for smaller-or-equal neighbors — two key-partitioned
    * shuffles, no driver-side graph state. At the fixpoint the edge set
    * IS the star (node → component-min) mapping. Same output contract
    * as [[connectedComponents]]: (id, component) for every id in
    * `pairs`, returned persisted (caller unpersists), loud failure if
    * the cap is hit. */
  def connectedComponentsStar(pairs: DataFrame, maxRounds: Int = 32,
                              onConverged: Int => Unit = _ => ()): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    def flat(df: DataFrame): DataFrame =
      // same per-round plan flattening as connectedComponents: the edge
      // frame is referenced twice per star op (groupBy min + join), so
      // nesting would double the plan tree every round
      spark.createDataFrame(df.rdd, df.schema)
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // (v, m) for v > u: v > u >= m, so never a self-loop
      nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient toward the larger endpoint; u's strictly-smaller
      // neighbors plus u itself all hang off their minimum
      val dir = e.select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      dir.join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(mins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    val nodes = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var edges = flat(
      pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .filter(col("a") =!= col("b")).distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var changed = 1L
    // carried edge count: counting `next` materializes it anyway, and
    // next becomes this round's `edges` — re-counting it next round
    // would be a third job per round for a number already in hand
    var nEdges = -1L
    try {
      while (changed > 0 && round < maxRounds) {
        round += 1
        if (nEdges < 0) nEdges = edges.count()
        val next = flat(smallStar(largeStar(edges)))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // fixpoint = identical edge SET (both stars emit distinct rows):
        // 2 jobs per round — count(next) (which also materializes it),
        // plus the left_anti only when the sizes agree
        val nNext = next.count()
        changed =
          if (nNext != nEdges) 1L
          else next.join(edges, Seq("a", "b"), "left_anti").count()
        edges.unpersist()
        edges = next
        nEdges = nNext
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponentsStar did not converge in $maxRounds rounds " +
            "— this cap should exceed log2(nodes); raise it or check for " +
            "nondeterministic edge input")
      onConverged(round)
      // at the fixpoint every non-root node has exactly one star edge to
      // its component min; roots appear only on the right side
      val labels = nodes.join(edges, nodes("id") === edges("a"), "left")
        .select(nodes("id"),
          coalesce(edges("b"), nodes("id")).as("component"))
      val out = labels.persist(StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize before the source edge blocks are freed
      out
    } finally {
      edges.unpersist()
      nodes.unpersist()
    }
  }

  /** Transitive near-dup dedup: like [[dedupNearMinhash]] but with the
    * classic connected-component semantics — every doc reachable through
    * a chain of VERIFIED near-dup pairs collapses into one cluster and
    * only the min-id representative survives. (The edge-local variant
    * keeps more docs: it only drops direct neighbors of smaller ids.) */
  def dedupNearTransitive(df: DataFrame, textCol: String, idCol: String,
                          shingleK: Int = 3, numHashes: Int = 12, bands: Int = 4,
                          jaccardThreshold: Double = 0.5,
                          starCC: Boolean = false): DataFrame = {
    val cand = minhashCandidatePairs(df, textCol, idCol, shingleK, numHashes, bands)
      .persist()
    try {
      val candIds = cand.select(col("id_a").as("__nd_id"))
        .unionAll(cand.select(col("id_b").as("__nd_id")))
      val candDocs = df.join(candIds, col(idCol) === col("__nd_id"), "left_semi")
      val verified = ngramJaccard(candDocs, cand, textCol, idCol, shingleK)
        .filter(col("jaccard") >= jaccardThreshold)
        .select(col("id_a"), col("id_b"))
      val labels =
        if (starCC) connectedComponentsStar(verified)
        else connectedComponents(verified)
      val drops =
        try labels
          .filter(col("id") =!= col("component"))
          .select(col("id").as("__nd_drop"))
          .localCheckpoint() // sever from cand + labels lineage (see above)
        finally labels.unpersist()
      df.join(drops, col(idCol) === col("__nd_drop"), "left_anti")
    } finally cand.unpersist()
  }

  /** 48-bit SimHash per document (bit b set iff the b-th bit of the
    * document's token hashes is set in the majority). 48 bits keeps the
    * packed value positive in int64 for engine-portable arithmetic.
    *
    * Shape: MAP-ONLY — one codegen'd pass per doc
    * (graft.functions.SimHash48), no explode, no aggregation, zero
    * shuffle. This replaced the relational explode → 48-conditional-sum
    * form, which shuffled a 49-column partial agg over every token row;
    * the signature depends on nothing outside the doc, so a doc-local
    * kernel is its correct shape at any scale. Hashing is the same
    * 60-bit MD5 prefix (HashFns.hash60), so the DuckDB oracles — which
    * still unroll the relational form — are unchanged. */
  def simhash48(df: DataFrame, textCol: String, idCol: String): DataFrame =
    simhash48WithCount(df, textCol, idCol).select(col("doc_id"), col("simhash"))

  /** [[simhash48]] plus the per-doc token count (`n_tok`) from the same
    * kernel pass — [[simhashPairs]] uses it as its de-skew filter.
    * Null-text docs are dropped, matching the relational form (explode
    * of a null token array emitted no rows for the doc). */
  def simhash48WithCount(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.SimHash48.simhash48(col(textCol)).as("__sh"))
      // coalesce is unreachable (text is non-null above, the kernel's
      // struct fields are non-nullable) — it exists to make the OUTPUT
      // nullability false, so downstream joins on these columns don't
      // generate isnotnull(simhash48(text).simhash) constraints that
      // get pushed into the scan and re-evaluate the kernel per row
      // (PlanAuditSpec kernel-in-DataFilters check)
      .select(col("doc_id"),
        coalesce(col("__sh.simhash"), lit(0L)).as("simhash"),
        coalesce(col("__sh.n_tok"), lit(0L)).as("n_tok"))

  /** SimHash near-dup pairs via multi-probe chunk banding (the SimHash
    * twin of [[minhashCandidatePairs]]): split the 48-bit signature into
    * `bands` equal chunks; two signatures within Hamming distance
    * d ≤ bands-1 must agree on at least one chunk (pigeonhole), so a join
    * on (chunk_idx, chunk_value) has FULL recall for maxHamming < bands —
    * then the exact Hamming distance (bit_count of xor) filters the
    * candidates. Never all-pairs: the shuffle carries (doc_id, chunk)
    * rows and the join is equi on the chunk value.
    *
    * De-skew: `minTokens` excludes documents with fewer tokens from
    * pairing. Near-empty docs all hash to near-zero signatures (few
    * majority votes), collapsing into a handful of quadratic hot chunk
    * buckets at corpus scale — the SimHash analogue of the all-sentinel
    * MinHash bucket. They cannot be meaningful near-dups (run exact dedup
    * for identical shorts), so dropping them changes no useful pair.
    * Note n_tok is never below 1 (an empty text tokenizes to one empty
    * token), so the guard needs minTokens >= 2 to bite — the default 3
    * keeps the skew protection ON by default; pass 1 to disable it
    * explicitly.
    *
    * Returns (id_a, id_b, hamming) with id_a < id_b, distinct. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bands: Int = 4,
                   minTokens: Int = 3): DataFrame = {
    require(bands > 0 && 48 % bands == 0, s"bands must divide 48, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall requires maxHamming < bands, got $maxHamming/$bands")
    val bits = 48 / bands
    val mask = (1L << bits) - 1
    // minTokens de-skew via the cheap raw-text predicate (n_tok ==
    // size(split(text, ' ')) by the kernel's contract) — a filter on
    // the computed n_tok would be substituted through the projection
    // and evaluate the simhash kernel twice per row (PlanAuditSpec's
    // kernel-in-DataFilters check)
    val sigs = simhash48WithCount(
        df.filter(size(split(col(textCol), " ")) >= minTokens),
        textCol, idCol)
      .select(col("doc_id"), col("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("simhash"), b * bits).bitwiseAND(mask)): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b, col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** End-to-end SimHash near-dup dedup: drop every doc that has a
    * SMALLER-id neighbor within `maxHamming` bits (edge-local keep-min-id
    * — the [[dedupNearMinhash]] decision rule over the SimHash metric).
    * Unlike the MinHash path no separate verification stage is needed:
    * the Hamming test inside [[simhashPairs]] IS exact. */
  def dedupSimhash(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bands: Int = 4,
                   minTokens: Int = 3): DataFrame = {
    val drops = simhashPairs(df, textCol, idCol, maxHamming, bands, minTokens)
      .select(col("id_b").as("__sd_drop")).distinct()
    df.join(drops, col(idCol) === col("__sd_drop"), "left_anti")
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (id_a, id_b): |A ∩ B| / |A ∪ B| over distinct k-shingles. Runs as
    * explode + join on shingle — only over the candidate set. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, textCol: String,
                   idCol: String, shingleK: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), shingleK)).as("sh"))
      .distinct()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("id_b") === col("sb.doc_id") &&
        col("sa.sh") === col("sb.sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    pairs
      .join(counts.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("id_b") === col("cb.doc_id"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        col("ca.n_sh").as("n_a"), col("cb.n_sh").as("n_b"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - coalesce(col("n_inter"), lit(0L))).cast("double"))
          .as("jaccard"))
  }
}
