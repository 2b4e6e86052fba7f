package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out back-to-back in a deterministic
  * order and chunk the concatenation into fixed-capacity training
  * contexts (the standard packed-pretraining layout — documents cross
  * context boundaries; no token is padded or dropped).
  *
  * Everything is one window over (shard, order): the running token
  * offset places each document, and integral div/mod against the
  * context size yields its (context, offset) coordinates. Packing is
  * PER SHARD — the window partitions by the shard key, so a 100 TB
  * corpus packs with one shuffle on the shard key and no global sort;
  * the deterministic order inside a shard makes the layout reproducible
  * on any cluster size.
  */
object PackingOps {

  /** @param shardCols   partition keys — each shard packs independently
    * @param orderCol    deterministic intra-shard layout order (unique)
    * @param tokenCol    per-document token count (must be >= 0)
    * @param contextSize tokens per training context (> 0)
    *
    * Adds: `pack_offset` (first token's offset in the shard stream),
    * `ctx_first`/`ctx_last` (contexts this doc touches), `ctx_offset`
    * (offset inside ctx_first), `n_ctx_spanned`. */
  def packContexts(df: DataFrame, shardCols: Seq[String], orderCol: String,
                   tokenCol: String, contextSize: Long): DataFrame = {
    require(contextSize >= 1, s"contextSize must be >= 1, got $contextSize")
    require(shardCols.nonEmpty,
      "packing requires at least one shard column (a global pack would " +
        "funnel the corpus through one partition — shard first, then pack)")
    val reserved = Set("pack_offset", "ctx_first", "ctx_last", "ctx_offset",
      "n_ctx_spanned")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input already has reserved/output columns: $clash")
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tok = col(tokenCol).cast("long")
    val off = coalesce(sum(tok).over(w), lit(0L))
    // empty docs (0 tokens) sit AT their offset: they belong to the
    // context that offset falls in and span exactly one context
    val lastTok = off + greatest(tok - 1, lit(0L))
    df.withColumn("pack_offset", off)
      .withColumn("ctx_first", call_function("div", col("pack_offset"), lit(contextSize)))
      .withColumn("ctx_last", call_function("div", lastTok, lit(contextSize)))
      .withColumn("ctx_offset", pmod(col("pack_offset"), lit(contextSize)))
      .withColumn("n_ctx_spanned", col("ctx_last") - col("ctx_first") + 1)
  }
}
