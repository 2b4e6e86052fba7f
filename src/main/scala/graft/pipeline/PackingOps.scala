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

  /** Overlapping token-window chunking — the other standard long-document
    * treatment (packContexts concatenates SHORT docs; this SPLITS long
    * docs into `chunkTokens`-sized windows every `strideTokens` tokens,
    * overlap = chunk − stride, so no token is lost at a boundary).
    *
    * Map-only + one generator: tokenize, compute the chunk count in
    * closed form, explode the chunk indices, slice the token array per
    * chunk — no shuffle, no window, no state; at 100 TB it is exactly a
    * projection with a fan-out of ~n_tokens/stride per document.
    *
    * Every document yields at least one chunk (an empty text tokenizes
    * to [""], one chunk of one empty token — matching DuckDB's
    * string_split). Output: (doc_id, n_tokens, chunk_idx, chunk_text,
    * n_chunk_tokens). */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    // chunks = 1 + ceil(max(n - chunk, 0) / stride), in pure integer math
    val extra = greatest(n - chunkTokens, lit(0L))
    val nChunks = lit(1L) + call_function("div",
      extra + (strideTokens - 1), lit(strideTokens.toLong))
    val start = col("chunk_idx") * strideTokens
    df.select(col(idCol).as("doc_id"), toks.as("__ck_toks"), n.as("n_tokens"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        array_join(slice(col("__ck_toks"), (start + 1).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong), col("n_tokens") - start).as("n_chunk_tokens"))
  }

  /** Length-bucketed micro-batching — the padding-efficiency layout:
    * docs are banded by token length (`len_bucket = n_tokens div
    * bucketWidth`), spread across `shards` by id hash, ordered by that
    * hash within each (bucket, shard), and grouped into
    * `batchSize`-document batches. Same-batch docs have token counts
    * within one bucket width of each other, so per-batch padding waste
    * is bounded by the width — the standard alternative to packing when
    * documents must stay intact.
    *
    * Scale shape: ONE window shuffle keyed on (len_bucket, shard). The
    * shard key is what makes this 100 TB-safe — a popular length band
    * (most corpora concentrate near the mode) would otherwise funnel
    * through a single task; with shards the batch id is the triple
    * (len_bucket, shard, batch_idx), every piece deterministic from the
    * id and count alone. Negative token counts are rejected per-row
    * (codegen'd guard, same contract as capTokensPerGroup); NULL counts
    * fail the cast guard too — a batch layout over unknown lengths is
    * meaningless. */
  def lengthBucketedBatches(df: DataFrame, idCol: String, tokenCol: String,
                            bucketWidth: Long, batchSize: Int,
                            shards: Int = 1): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val clash = df.columns.toSet
      .intersect(Set("len_bucket", "shard", "batch_idx", "batch_pos"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val tok = col(tokenCol).cast("long")
    val guarded = when(tok.isNull || tok < 0, raise_error(concat(
        lit(s"lengthBucketedBatches: null or negative $tokenCol for $idCol="),
        col(idCol).cast("string"))).cast("long"))
      .otherwise(tok)
    val h = HashFns.hash32(concat(lit("batch:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("len_bucket"), col("shard"))
      .orderBy(h, col(idCol))
    val pos = row_number().over(w).cast("long") - 1
    df.withColumn("len_bucket", call_function("div", guarded, lit(bucketWidth)))
      .withColumn("shard", pmod(h, lit(shards.toLong)))
      .withColumn("batch_idx", call_function("div", pos, lit(batchSize.toLong)))
      .withColumn("batch_pos", pmod(pos, lit(batchSize.toLong)))
  }
}
