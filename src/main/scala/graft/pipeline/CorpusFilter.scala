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
  def filterCorpus(df: DataFrame, textCol: String, idCol: String,
                   langCode: String = "en", minQuality: Double = 40.0,
                   minTokPermille: Int = 100): DataFrame = {
    val quals = TextOps.qualityColumns(col(textCol)).toMap
    val base = df.select(col(idCol), col(textCol),
      TextOps.languageId(col(textCol)).getField("lang").as("__lang"),
      quals("n_tokens").as("n_tokens"),
      quals("quality_score").as("quality_score"))
    val kept = base.filter(col("__lang") === langCode &&
      col("quality_score") >= minQuality)
    val cut = StatsOps.exactQuantiles(kept, col("n_tokens"), Seq(minTokPermille))
      .select(col("value").as("__tok_cut"))
    val gated = kept.crossJoin(broadcast(cut))
      .filter(col("n_tokens") >= col("__tok_cut"))
    DedupOps.dedupExact(gated, textCol, idCol)
      .select(col(idCol), col("n_tokens"), col("quality_score"))
  }
}
