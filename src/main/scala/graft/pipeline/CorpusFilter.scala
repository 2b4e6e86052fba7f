package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus filtering — the composed shape of a real
  * training-data preparation pass, built entirely from the engine's own
  * operators so the whole pipeline stays one declarative plan:
  *
  *  1. per-doc text statistics + language ID (map-only projection);
  *  2. language + quality gates (map-only filter);
  *  3. data-derived length cutoff: an exact token-count quantile of the
  *     SURVIVING docs (StatsOps — one tiny value-grouped aggregation),
  *     broadcast back as a one-row join;
  *  4. exact dedup keep-min-id over the survivors (DedupOps — one
  *     digest-keyed window).
  *
  * Total cost at scale: one pass over the corpus + one digest shuffle of
  * the survivors + two scalar-sized aggregations. Nothing quadratic,
  * nothing driver-side.
  */
object CorpusFilter {

  /** @param langCode        keep docs whose predicted language equals this
    * @param minQuality      keep docs at or above this quality score
    * @param minTokPermille  drop docs below this token-count permille of
    *                        the post-gate corpus (e.g. 100 = p10)
    * Returns (idCol, n_tokens, quality_score) for surviving docs. */
  /** THE gate predicate — the one definition of "this document passes
    * the language/quality thresholds", shared by the batch filter
    * ([[gate]]), the streaming twin, and the admission verdicts
    * ([[AdmissionOps.withAdmissionVerdict]]), so the gates cannot
    * drift. None disables a clause; with both None the predicate is a
    * constant TRUE. A null text/quality evaluates to null — callers
    * treat non-TRUE as fail (the filter form drops such rows). */
  def gatePassColumn(text: org.apache.spark.sql.Column,
                     langCode: Option[String],
                     minQuality: Option[Double]): org.apache.spark.sql.Column = {
    val quals = TextOps.qualityColumns(text).toMap
    val langOk = langCode.map(c =>
      TextOps.languageId(text).getField("lang") === c)
    val qualOk = minQuality.map(q => quals("quality_score") >= q)
    (langOk.toSeq ++ qualOk.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The shared map-only gate: adds n_tokens + quality_score and keeps
    * rows passing [[gatePassColumn]]. Both the batch pipeline and the
    * streaming twin (`PipelineStreams.corpusFilterStream`) call THIS,
    * so the gates cannot drift apart. */
  def gate(df: DataFrame, textCol: String, langCode: String,
           minQuality: Double): DataFrame = {
    val quals = TextOps.qualityColumns(col(textCol)).toMap
    df.withColumn("n_tokens", quals("n_tokens"))
      .withColumn("quality_score", quals("quality_score"))
      .filter(gatePassColumn(col(textCol), Some(langCode), Some(minQuality)))
  }

  /** Ceiling on the cutoff histogram's distinct-value count (~16 MB of
    * (value, count) pairs at the default). The bounded-collect argument
    * below holds for integral token counts; the cap turns it from a
    * comment into a check. */
  val DefaultMaxCutoffHistogram: Int = 1 << 20

  def filterCorpus(df: DataFrame, textCol: String, idCol: String,
                   langCode: String = "en", minQuality: Double = 40.0,
                   minTokPermille: Int = 100,
                   maxCutoffHistogram: Int = DefaultMaxCutoffHistogram): DataFrame = {
    require(maxCutoffHistogram >= 1)
    import org.apache.spark.sql.expressions.Window
    // Run the text gate ONCE: project the survivors down to the narrow
    // columns every later stage needs — id, token count, quality, and
    // the dedup digest (computed here, while the text is already in
    // hand) — and sever that projection's lineage (a handful of scalars
    // per surviving doc; blocks are freed when the plan is GC'd, the
    // same hygiene as the CC rounds in DedupOps; in the default local
    // mode checkpoint blocks are executor-local and unreplicated, so an
    // executor loss mid-pipeline fails the job instead of recomputing —
    // set Checkpoints.ConfKey to "reliable" on preemptible fleets; the
    // alternative, a persist the caller can never safely unpersist,
    // leaks executor storage across queries). Everything downstream
    // (quantile snapshot, bucketed cumsum, length filter, digest-window
    // dedup) reads the checkpointed relation, so the expensive part —
    // language ID + quality stats over the raw text — is paid exactly
    // once per pipeline instead of once per consuming stage.
    val kept = Checkpoints.sever(
      gate(df.select(col(idCol), col(textCol)), textCol,
          langCode, minQuality)
        .select(col(idCol), col("n_tokens"), col("quality_score"),
          DedupOps.digest(col(textCol)).as("__cf_digest")))
    // The cutoff comes from ONE value-histogram job over the checkpoint:
    // token counts have boundedly many distinct values (≤ the longest
    // document), so the (value, count) relation is scalar-sized by the
    // same argument as the ANN centroid snapshots, and the exact-rank
    // rule — smallest value whose cumulative count reaches
    // ceil(p·n/1000), identical to StatsOps.exactQuantiles and the
    // oracle — folds in the driver. A metric without that bound (e.g.
    // continuous scores) must go through StatsOps.exactQuantiles'
    // range-bucketed distributed path instead — and that is now a CHECK,
    // not a comment: the collect is limit-bounded, and blowing the cap
    // fails loudly before the driver ever holds an unbounded relation.
    val histRows = kept.filter(col("n_tokens").isNotNull)
      .groupBy(col("n_tokens")).agg(count(lit(1)).as("c"))
      .limit(maxCutoffHistogram + 1)
      .collect()
    require(histRows.length <= maxCutoffHistogram,
      s"filterCorpus: cutoff histogram exceeds $maxCutoffHistogram distinct metric " +
        "values — the bounded-histogram argument only holds for integral token " +
        "counts; route a high-cardinality metric through StatsOps.exactQuantiles' " +
        "distributed path instead")
    val hist = histRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    val rank = java.lang.Math.floorDiv(minTokPermille.toLong * n + 999L, 1000L)
    val cut = {
      var cum = 0L
      hist.find { case (_, c) => cum += c; cum >= rank }.map(_._1)
    }
    // empty post-gate corpus → no quantile value → nothing can survive
    val gated = cut match {
      case Some(v) => kept.filter(col("n_tokens") >= lit(v))
      case None => kept.filter(lit(false))
    }
    // keep-min-id over the precomputed digest (same one-shuffle shape
    // as DedupOps.dedupExact, which would otherwise recompute the
    // digest from the text — the column this plan deliberately dropped)
    val w = Window.partitionBy(col("__cf_digest")).orderBy(col(idCol))
    gated.withColumn("__cf_rn", row_number().over(w))
      .filter(col("__cf_rn") === 1)
      .select(col(idCol), col("n_tokens"), col("quality_score"))
  }
}
