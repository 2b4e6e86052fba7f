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
  /** The shared map-only gate: adds n_tokens + quality_score and keeps
    * rows passing the language and quality thresholds. Both the batch
    * pipeline and the streaming twin (`PipelineStreams
    * .corpusFilterStream`) call THIS, so the gates cannot drift apart. */
  def gate(df: DataFrame, textCol: String, langCode: String,
           minQuality: Double): DataFrame = {
    val quals = TextOps.qualityColumns(col(textCol)).toMap
    df.withColumn("__cf_lang",
        TextOps.languageId(col(textCol)).getField("lang"))
      .withColumn("n_tokens", quals("n_tokens"))
      .withColumn("quality_score", quals("quality_score"))
      .filter(col("__cf_lang") === langCode &&
        col("quality_score") >= minQuality)
      .drop("__cf_lang")
  }

  def filterCorpus(df: DataFrame, textCol: String, idCol: String,
                   langCode: String = "en", minQuality: Double = 40.0,
                   minTokPermille: Int = 100): DataFrame = {
    val kept = gate(df.select(col(idCol), col(textCol)), textCol,
      langCode, minQuality)
    // The quantile consumes its input twice (min/max/n snapshot +
    // bucketed cumsum) and every evaluation of `kept` re-runs the full
    // text gate (language ID + quality stats over the text) — so persist
    // JUST the token-count column (one long per surviving doc; trivially
    // cacheable even at 1e10 docs) and derive the scalar cutoff from the
    // cache. The gate then runs exactly twice per pipeline: once to
    // populate this cache, once in the final output pass (which needs
    // the text anyway for the dedup digest).
    val tok = kept.select(col("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cutRow =
      try StatsOps.exactQuantiles(tok, col("n_tokens"), Seq(minTokPermille))
        .collect()
      finally tok.unpersist()
    // empty post-gate corpus → no quantile row → nothing can survive
    val gated = cutRow.headOption match {
      case Some(r) if !r.isNullAt(1) =>
        kept.filter(col("n_tokens") >= lit(r.get(1)))
      case _ => kept.filter(lit(false))
    }
    DedupOps.dedupExact(gated, textCol, idCol)
      .select(col(idCol), col("n_tokens"), col("quality_score"))
  }
}
