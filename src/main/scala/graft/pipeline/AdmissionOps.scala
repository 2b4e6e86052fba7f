package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily ADMISSION front door — the one-call form of the job a
  * training-data pipeline actually runs on every new crawl segment:
  * screen the batch against the quality gates and EVERY stored artifact
  * (exact-digest index, MinHash near-dup index, decontamination index,
  * bigram LM model), and give each document its FIRST-FAILURE verdict:
  *
  *   gate → exact_dup → near_dup → contaminated → low_quality →
  *   classifier_reject → admitted
  *
  * Each stage is optional (no store path → stage skipped), and each
  * consults the corresponding persisted artifact through its audited
  * probe ([[DedupOps.probeDigestIndex]],
  * [[DedupOps.nearDupAgainstStoredIndex]],
  * [[TextOps.screenAgainstStoredDecontam]],
  * [[TextOps.scoreAgainstStoredLm]]) — history is never re-read as a
  * corpus, and every probe keeps its prescreen (digest bloom, band
  * bloom + hot-band cap, broadcast bench shingles).
  *
  * Verdict semantics are CASCADE-EQUIVALENT while running every stage
  * over the full batch as one declarative plan: every stage predicate
  * is a pure function of one document's text against the stores, so a
  * doc's flags don't depend on which other batch docs survive — and the
  * one batch-relative stage, in-batch exact dedup, partitions by the
  * content digest, within which text (hence gate status and every other
  * flag) is uniform: a group whose keeper a cascade would remove at an
  * earlier stage has that same earlier verdict here for ALL its
  * members, keeper included, by precedence.
  * Trade stated plainly: a cascade would skip screening already-dropped
  * docs (cheaper on heavy-dup corpora) at the cost of materializing
  * text-carrying survivor relations between stages; this form scans the
  * batch once per enabled stage, keeps everything lazy, and yields the
  * per-stage accounting every pipeline monitors anyway. Flag relations
  * are dropped-id-sized (AQE broadcasts them); the only full-batch
  * shuffle is the in-batch dedup window — the same single shuffle as
  * [[DedupOps.dedupExact]].
  */
object AdmissionOps {

  /** Paths of the persisted artifacts a batch screens against; None
    * skips that stage. */
  final case class AdmissionStores(
      digestIndexPath: Option[String] = None,
      minhashIndexPath: Option[String] = None,
      decontamIndexPath: Option[String] = None,
      lmModelPath: Option[String] = None,
      nbModelPath: Option[String] = None)

  val VerdictGate = "gate"
  val VerdictExactDup = "exact_dup"
  val VerdictNearDup = "near_dup"
  val VerdictContaminated = "contaminated"
  val VerdictLowQuality = "low_quality"
  val VerdictClassifierReject = "classifier_reject"
  val VerdictAdmitted = "admitted"

  /** The batch with a `verdict` column appended — every input row keeps
    * all its columns and gains its first-failure stage name (or
    * "admitted"). Gate semantics mirror [[CorpusFilter.gate]]: a doc
    * passes only when the configured predicates evaluate TRUE (a null
    * text/quality fails the gate, as the filter form drops it).
    * `lmMinAvgScore` is in [[TextOps.scoreAgainstStoredLm]]'s integer
    * fixed-point units; docs below it (including zero-bigram docs,
    * which score 0) are rejected as low_quality when the LM stage is
    * enabled. */
  def withAdmissionVerdict(spark: SparkSession, batch: DataFrame,
                           textCol: String, idCol: String,
                           stores: AdmissionStores,
                           langCode: Option[String] = None,
                           minQuality: Option[Double] = None,
                           nearDupMinAgree: Double = 0.5,
                           decontamMinOverlap: Long = 5L,
                           lmMinAvgScore: Option[Long] = None,
                           nbMinMarginMicro: Option[Long] = None): DataFrame = {
    require(lmMinAvgScore.isEmpty || stores.lmModelPath.nonEmpty,
      "lmMinAvgScore needs stores.lmModelPath")
    require(nbMinMarginMicro.isEmpty || stores.nbModelPath.nonEmpty,
      "nbMinMarginMicro needs stores.nbModelPath")
    import org.apache.spark.sql.expressions.Window
    val helperCols = Seq("__ad_gate", "__ad_digest", "__ad_rn",
      "__ad_exact", "__ad_near", "__ad_contam", "__ad_lm", "__ad_nb")
    (helperCols :+ "verdict").foreach(h => require(
      !batch.columns.contains(h),
      s"batch already has a column named $h"))
    // the one shared gate definition — CorpusFilter.gate and the
    // streaming twin consume the same predicate, so the filter form
    // and the verdict form cannot drift
    val gatePass: Column =
      CorpusFilter.gatePassColumn(col(textCol), langCode, minQuality)
    // keep-min-id per digest (dedupExact's window); within a digest
    // group the text is identical, so gate status and every stored-side
    // flag are uniform — the rank never has to look at them
    val withRank = batch
      .withColumn("__ad_gate", !coalesce(gatePass, lit(false)))
      .withColumn("__ad_digest",
        coalesce(DedupOps.digest(col(textCol)), lit("")))
      .withColumn("__ad_rn", row_number().over(
        Window.partitionBy(col("__ad_digest"))
          .orderBy(col(idCol).asc)))
    def flagRel(rel: DataFrame, srcId: String, flag: String): DataFrame =
      rel.select(col(srcId).as(idCol)).distinct()
        .withColumn(flag, lit(true))
    val flags = Seq(
      stores.digestIndexPath.map(p => flagRel(
        DedupOps.probeDigestIndex(spark, p, batch, textCol, idCol),
        "probe_id", "__ad_exact")),
      stores.minhashIndexPath.map(p => flagRel(
        DedupOps.nearDupAgainstStoredIndex(spark, p, batch, textCol,
          idCol, nearDupMinAgree),
        "new_id", "__ad_near")),
      stores.decontamIndexPath.map(p => flagRel(
        TextOps.screenAgainstStoredDecontam(spark, p, batch, textCol,
          idCol, decontamMinOverlap),
        "train_id", "__ad_contam")),
      (stores.lmModelPath, lmMinAvgScore) match {
        case (Some(p), Some(minScore)) => Some(flagRel(
          TextOps.scoreAgainstStoredLm(spark, p, batch, textCol, idCol)
            .filter(col("avg_score") < minScore),
          idCol, "__ad_lm"))
        case _ => None
      },
      // trained-classifier stage: reject docs whose NB margin
      // (score_pos − score_neg) falls below the floor — margin 0 means
      // "must be predicted positive" (ties admit, matching predicted)
      (stores.nbModelPath, nbMinMarginMicro) match {
        case (Some(p), Some(minMargin)) => Some(flagRel(
          ClassifierOps.scoreAgainstStoredNb(spark, p, batch, textCol,
            idCol)
            .filter(col("score_pos_micro") - col("score_neg_micro") <
              minMargin),
          idCol, "__ad_nb"))
        case _ => None
      }).flatten
    val joined = flags.foldLeft(withRank)(
      (acc, f) => acc.join(f, Seq(idCol), "left"))
    def flagged(c: String): Column =
      if (joined.columns.contains(c)) coalesce(col(c), lit(false))
      else lit(false)
    val verdict =
      when(col("__ad_gate"), VerdictGate)
        .when(flagged("__ad_exact"), VerdictExactDup)
        .when(col("__ad_rn") > 1, VerdictExactDup)
        .when(flagged("__ad_near"), VerdictNearDup)
        .when(flagged("__ad_contam"), VerdictContaminated)
        .when(flagged("__ad_lm"), VerdictLowQuality)
        .when(flagged("__ad_nb"), VerdictClassifierReject)
        .otherwise(VerdictAdmitted)
    joined.withColumn("verdict", verdict)
      .drop(helperCols: _*)
  }

  /** (id, verdict) for every batch doc — the monitoring relation. */
  def admissionVerdicts(spark: SparkSession, batch: DataFrame,
                        textCol: String, idCol: String,
                        stores: AdmissionStores,
                        langCode: Option[String] = None,
                        minQuality: Option[Double] = None,
                        nearDupMinAgree: Double = 0.5,
                        decontamMinOverlap: Long = 5L,
                        lmMinAvgScore: Option[Long] = None,
                        nbMinMarginMicro: Option[Long] = None): DataFrame =
    withAdmissionVerdict(spark, batch, textCol, idCol, stores, langCode,
      minQuality, nearDupMinAgree, decontamMinOverlap, lmMinAvgScore,
      nbMinMarginMicro)
      .select(col(idCol), col("verdict"))

  /** The admitted rows only, original schema — the batch that lands in
    * the corpus. */
  def admitAgainstStores(spark: SparkSession, batch: DataFrame,
                         textCol: String, idCol: String,
                         stores: AdmissionStores,
                         langCode: Option[String] = None,
                         minQuality: Option[Double] = None,
                         nearDupMinAgree: Double = 0.5,
                         decontamMinOverlap: Long = 5L,
                         lmMinAvgScore: Option[Long] = None,
                         nbMinMarginMicro: Option[Long] = None): DataFrame =
    withAdmissionVerdict(spark, batch, textCol, idCol, stores, langCode,
      minQuality, nearDupMinAgree, decontamMinOverlap, lmMinAvgScore,
      nbMinMarginMicro)
      .filter(col("verdict") === VerdictAdmitted)
      .drop("verdict")

  /** One micro-batch through the ADMIT→INGEST loop, exactly once — the
    * continuous form of the daily admission job, closing the same loop
    * for the corpus that [[graft.pipeline.WarcOps.ingestWarcIndexBatch]]
    * closes for the crawl index: the batch screens against the stores
    * AS OF the batch start, its admitted rows land at
    * `outDir/b<batchId>`, and their digests fold into the digest store
    * so the NEXT batch's exact screen covers everything ever admitted.
    * The digest store is the loop's own artifact (first batch builds
    * it; the batch-id pointer lives in its meta); `staticStores` are
    * read-only snapshots (MinHash/decontam/LM) maintained by their own
    * legs.
    *
    * `minhashIndexPath` closes the loop over NEAR-dups too: when set,
    * the loop also owns a MinHash signature store — the batch's
    * near-dup screen consults it, and admitted rows fold their
    * signatures in ([[DedupOps.ingestMinhashBatch]]), so batch N+1's
    * near_dup stage catches a PARAPHRASE of what batch N admitted, not
    * just a byte-identical copy. First batch builds it with the given
    * geometry; after that the store's meta pins its own.
    *
    * Store-coverage contract, stated plainly: the loop-owned stores
    * cover the ADMITTED corpus — "exact_dup"/"near_dup" mean "already
    * in (or nearly in) the corpus". A byte-identical copy of a
    * previously REJECTED doc is not an exact_dup; it re-derives the
    * same rejection through the same screens (correct verdict, re-paid
    * compute).
    *
    * Crash-window audit (write admitted FIRST, ingest digests SECOND,
    * ingest signatures THIRD): a crash before the digest ingest
    * replays into a recompute against the unchanged stores — same
    * verdicts, `b<batchId>` overwritten wholesale, then both ingests
    * commit; a crash BETWEEN the two ingests replays into the digest
    * pointer skip, which re-reads the landed `b<batchId>` rows and
    * re-offers them to the signature store — whose OWN batch pointer
    * makes that a no-op if it had already applied (each store is
    * exactly-once on its own pointer, and the landed parquet is the
    * replay's source of truth, so the re-offer can never re-screen or
    * re-admit anything). Id regressions refuse loudly like every other
    * pointer. */
  def ingestAdmissionBatch(spark: SparkSession, batch: DataFrame,
                           textCol: String, idCol: String, batchId: Long,
                           outDir: String, digestIndexPath: String,
                           staticStores: AdmissionStores = AdmissionStores(),
                           langCode: Option[String] = None,
                           minQuality: Option[Double] = None,
                           nearDupMinAgree: Double = 0.5,
                           decontamMinOverlap: Long = 5L,
                           lmMinAvgScore: Option[Long] = None,
                           nbMinMarginMicro: Option[Long] = None,
                           bloomBits: Int = 1 << 20,
                           bloomHashes: Int = 4,
                           minhashIndexPath: Option[String] = None,
                           minhashShingleK: Int = 3,
                           minhashNumHashes: Int = 12,
                           minhashBands: Int = 4): Boolean = {
    require(staticStores.digestIndexPath.isEmpty,
      "the admission loop OWNS the digest store — pass digestIndexPath, " +
        "not staticStores.digestIndexPath")
    require(minhashIndexPath.isEmpty || staticStores.minhashIndexPath.isEmpty,
      "the admission loop OWNS the near-dup store when minhashIndexPath " +
        "is set — a second, static MinHash store would screen against " +
        "a different corpus than the loop admits into")
    def foldSignatures(rows: DataFrame): Unit =
      minhashIndexPath.foreach { p =>
        DedupOps.ingestMinhashBatch(spark, p, rows, textCol, idCol,
          batchId, minhashShingleK, minhashNumHashes, minhashBands,
          bloomBits, bloomHashes)
      }
    val hasStore = MetaIO.metaExistsOrRecover(spark, digestIndexPath)
    if (hasStore) {
      val meta = DedupOps.readDigestIndexMeta(spark, digestIndexPath)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("admission loop",
          digestIndexPath, batchId, meta.lastBatchId, "documents",
          "admitAgainstStores + appendDigestIndex")
        // replayed batch: b<batchId> already on disk. Close the
        // between-ingests crash window by re-offering the LANDED rows
        // to the signature store; its own pointer no-ops the common
        // case where it already applied.
        if (batchId == meta.lastBatchId && minhashIndexPath.nonEmpty)
          foldSignatures(spark.read.parquet(s"$outDir/b$batchId"))
        return false
      }
    }
    val hasMinhash = minhashIndexPath.exists(p =>
      MetaIO.metaExistsOrRecover(spark, p))
    // observability for the one undetectable replay gap: the crash-
    // window catch-up above fires only when the EXACT batch id is
    // replayed — a restart with a fresh checkpoint that jumps past a
    // crashed batch leaves the signature store permanently short of
    // that batch's signatures with no query-level error. A pointer lag
    // > 1 is exactly that signature (the common between-ingests crash
    // is lag ≤ 1 and heals on replay); warn loudly and expose the
    // number via [[signatureStoreLag]] for the monitoring loop.
    if (hasStore && hasMinhash) {
      val lag = signatureStoreLag(spark, digestIndexPath,
        minhashIndexPath.get)
      if (lag > 1L) System.err.println(
        s"[graft] admission loop: signature store at " +
          s"${minhashIndexPath.get} trails the digest store by $lag " +
          "batches — a crashed batch's catch-up was skipped; near-dup " +
          "screening misses those batches until their landed rows are " +
          "re-offered via DedupOps.ingestMinhashBatch")
    }
    val stores = staticStores.copy(
      digestIndexPath = if (hasStore) Some(digestIndexPath) else None,
      minhashIndexPath =
        if (hasMinhash) minhashIndexPath else staticStores.minhashIndexPath)
    val admitted = admitAgainstStores(spark, batch, textCol, idCol,
      stores, langCode, minQuality, nearDupMinAgree, decontamMinOverlap,
      lmMinAvgScore, nbMinMarginMicro)
      .localCheckpoint() // consumed thrice: landing write + both ingests
    try {
      admitted.write.mode("overwrite").parquet(s"$outDir/b$batchId")
      DedupOps.ingestDigestBatch(spark, digestIndexPath, admitted,
        textCol, batchId, bloomBits, bloomHashes)
      foldSignatures(admitted)
    } finally admitted.unpersist()
    true
  }

  /** How far the admission loop's SIGNATURE store's applied-batch
    * pointer trails its DIGEST store's (0 = in sync). The digest
    * pointer advances every applied batch; the signature fold follows
    * in the same call, so lag ≤ 1 is the transient between-ingests
    * crash window (healed by replaying the same batch id). Lag > 1
    * means a restart SKIPPED past a crashed batch: those batches'
    * admitted signatures are missing from the near-dup screen until
    * their landed `outDir/b<id>` rows are re-offered via
    * [[DedupOps.ingestMinhashBatch]]. Poll it from the monitoring
    * loop; [[ingestAdmissionBatch]] also warns at ingest time. */
  def signatureStoreLag(spark: SparkSession, digestIndexPath: String,
                        minhashIndexPath: String): Long = {
    val d = DedupOps.readDigestIndexMeta(spark, digestIndexPath)
      .lastBatchId
    val m = DedupOps.readMinhashIndexMeta(spark, minhashIndexPath)
      .lastBatchId
    math.max(0L, d - m)
  }

  /** Per-stage drop counts — ONE aggregation over the verdicts, the
    * number every daily-admission dashboard plots. */
  def admissionReport(spark: SparkSession, batch: DataFrame,
                      textCol: String, idCol: String,
                      stores: AdmissionStores,
                      langCode: Option[String] = None,
                      minQuality: Option[Double] = None,
                      nearDupMinAgree: Double = 0.5,
                      decontamMinOverlap: Long = 5L,
                      lmMinAvgScore: Option[Long] = None,
                      nbMinMarginMicro: Option[Long] = None): DataFrame =
    admissionVerdicts(spark, batch, textCol, idCol, stores, langCode,
      minQuality, nearDupMinAgree, decontamMinOverlap, lmMinAvgScore,
      nbMinMarginMicro)
      .groupBy(col("verdict")).agg(count(lit(1)).as("n_docs"))
}
