package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the corpus — BM25 top-K with an INTEGER-EXACT
  * scoring variant (every signal is BIGINT arithmetic: scaled integral
  * divisions, no log, no FP accumulation), so scores are
  * bit-reproducible at any parallelism and carry an exact SQL oracle.
  * The [[TextOps.ngramFamiliarity]] convention, applied to Robertson &
  * Zaragoza's ranking function (Okapi BM25, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", Found. Trends IR 2009) with
  * the standard k1 = 1.2, b = 0.75 folded into exact rationals:
  *
  *   avgdl_milli = ⌊1000·T / N⌋                       (corpus scalar)
  *   tf_micro    = ⌊22·10⁶·tf / (10·tf + 3 + ⌊9000·dl / avgdl_milli⌋)⌋
  *   idf_micro   = min(⌊10⁶·(2(N−df)+1) / (2·df+1)⌋, 10¹¹)
  *   score_micro = Σ_t ⌊idf_micro(t)·tf_micro(t,d) / 10⁶⌋
  *
  * where N = corpus docs, T = corpus tokens, dl = doc tokens, tf = term
  * frequency, df = document frequency; the sum ranges over the query's
  * DISTINCT terms. tf_micro is the exact BM25 saturation term scaled by
  * 10⁶ — with k1 = 6/5 and b = 3/4, tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  * multiplies out to 22·tf/(10·tf + 3 + 9·dl/avgdl), integer-exact once
  * dl/avgdl is carried in millis. idf_micro is the Robertson idf's
  * ARGUMENT (N−df+½)/(df+½) scaled by 10⁶ (monotone in df like the log
  * form, which is all ranking needs), capped at 10¹¹ so the worst-case
  * per-term product stays far under 2⁶³ (cap·max tf_micro·64 terms
  * ≈ 1.4·10¹⁹/8 — documented headroom, loudly bounded by maxQueryTerms
  * at the API).
  *
  * Token arithmetic follows `split(text, ' ')` exactly (the repo-wide
  * tokenizer seam), ties break by doc_id ascending, and top-K selection
  * is a bounded pair heap ([[graft.functions.LongPairMinK]]) — no
  * WindowExec anywhere, so a stopword query term that matches the whole
  * corpus costs a k-slot buffer per query, not a per-query sort. */
object RetrievalOps {

  /** idf saturation cap — keeps idf_micro·tf_micro·terms < 2⁶³. */
  val IdfCapMicro: Long = 100000000000L

  /** Loud bound on a query's distinct terms: 64 terms at the idf cap
    * and max tf saturation sum to ~1.4·10¹⁹/8 ≈ 1.8·10¹⁸ < 2⁶³. */
  val MaxQueryTerms: Int = 64

  private def div(a: Column, b: Column): Column = call_function("div", a, b)

  /** Per-(token, doc) term frequencies — the postings relation, ONE
    * partial-aggregated corpus shuffle. */
  private def rawPostings(df: DataFrame, textCol: String,
                          idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Postings denormalized with each doc's length — the relation BOTH
    * the one-shot scorer and the stored index persist: (token, doc_id,
    * tf, dl). dl = Σ tf per doc, derived from the postings themselves
    * (split-tokenizer arithmetic: empty text is one empty token, so
    * every doc has dl ≥ 1). Carrying dl on the posting row costs 8
    * bytes/posting and buys the probe path freedom from a corpus-wide
    * doc-length join at query time. */
  def postingsWithDocLen(df: DataFrame, textCol: String,
                         idCol: String): DataFrame = {
    val post = Checkpoints.sever(rawPostings(df, textCol, idCol))
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    post.join(dl, Seq("doc_id"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
  }

  /** One-row corpus stats frame from the narrow (doc_id, dl) relation:
    * (n_docs, total_tokens, avgdl_milli) — broadcast into the scorer,
    * never collected to the driver. */
  private def statsOf(docLens: DataFrame): DataFrame =
    docLens.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"), col("total_tokens"),
        div(lit(1000L) * col("total_tokens"), col("n_docs"))
          .as("avgdl_milli"))

  /** Per-query DISTINCT terms, loudly bounded by [[MaxQueryTerms]]
    * (the overflow-headroom contract above — enforced in-plan via
    * raise_error so the guard rides the same job, no driver pass). */
  def queryTerms(queries: DataFrame, queryIdCol: String,
                 queryTextCol: String): DataFrame = {
    val toks = array_distinct(TextOps.tokens(col(queryTextCol)))
    // a NULL query text makes size(toks) NULL, which fails the when
    // predicate and would fire the over-width error MISLEADINGLY —
    // name both causes in one message (the guard stays one in-plan
    // branch either way)
    queries.select(col(queryIdCol).as("query_id"),
        explode(when(size(toks) <= MaxQueryTerms, toks)
          .otherwise(raise_error(concat(lit("bm25: query "),
            col(queryIdCol).cast("string"),
            lit(s" is null or has more than $MaxQueryTerms distinct " +
              "terms — shorten the query (or drop null rows) or raise " +
              "the scoring scale headroom")))))
          .as("token"))
  }

  /** Score candidate postings against the query terms and keep each
    * query's top-K — the ONE scorer behind the in-memory and stored
    * paths, so the two are output-identical by construction.
    *
    * `cand` must hold EVERY posting of every query term (and may hold
    * only those): df per token is then computable from `cand` itself.
    * Both joins broadcast the query-workload side; the only
    * corpus-proportional shuffle is the per-(query, doc) score rollup,
    * partial-aggregated. Top-K is the bounded pair heap on
    * (−score, doc_id) — ascending pairs give score DESC, doc_id ASC. */
  private def scoreTopK(cand: DataFrame, stats: DataFrame,
                        qterms: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bm25: k must be >= 1, got $k")
    val dfreq = cand.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val n = col("n_docs")
    val idfRaw = div(lit(1000000L) * (lit(2L) * (n - col("__df")) + lit(1L)),
      lit(2L) * col("__df") + lit(1L))
    val tfComp = div(lit(22000000L) * col("tf"),
      lit(10L) * col("tf") + lit(3L) +
        div(lit(9000L) * col("dl"), col("avgdl_milli")))
    val contrib = div(least(idfRaw, lit(IdfCapMicro)) * tfComp,
      lit(1000000L))
    val scored = cand
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(contrib).as("score_micro"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.LongPairMinK.minK(
        -col("score_micro"), col("doc_id"), k).as("__pairs"))
      .select(col("query_id"),
        posexplode(col("__pairs")).as(Seq("__i", "__pair")))
      .select(col("query_id"),
        (col("__i") + 1).cast("long").as("rank"),
        col("__pair").getField("b").as("doc_id"),
        (-col("__pair").getField("a")).as("score_micro"))
  }

  /** One-shot ranked retrieval: BM25 top-`k` docs per query, scored
    * with the integer-exact variant above. Returns (query_id, rank,
    * doc_id, score_micro); queries with no matching doc emit nothing.
    *
    * Shape: ONE severed postings kernel pass (consumed by the doc-length
    * rollup and the candidate filter), stats from the narrow (doc, dl)
    * relation, candidates = postings semi-joined by the broadcast term
    * set, and the dl join happens AFTER that filter — docs sharing no
    * term with a query never leave the semi-join, so everything past
    * the postings build tracks MATCHED postings, not the corpus. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, queryIdCol: String,
               queryTextCol: String, k: Int): DataFrame = {
    val post = Checkpoints.sever(rawPostings(docs, textCol, idCol))
    val dl = Checkpoints.sever(
      post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
    val stats = statsOf(dl)
    val qt = queryTerms(queries, queryIdCol, queryTextCol)
    val terms = qt.select(col("token")).distinct()
    val cand = post.join(broadcast(terms), Seq("token"), "left_semi")
      .join(dl, Seq("doc_id"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
    scoreTopK(cand, stats, qt, k)
  }

  // ---- stored retrieval-index lifecycle -----------------------------------
  //
  // The PERSISTED form of the postings relation — ranked retrieval's
  // managed artifact (the thirteenth lifecycle): a corpus indexes once,
  // every later query workload probes at matched-postings cost, and
  // daily segments fold in incrementally. Shared artifact discipline:
  //
  //   path/postings/e<N>  (token, doc_id, tf, dl), token-sorted within
  //                       partitions so a probe's term filter prunes
  //                       parquet row groups by min/max stats
  //   path/docs/e<N>      (doc_id) — the append anti-join's narrow side
  //   path/meta           window + corpus counters + applied batch id,
  //                       swapped LAST (MetaIO.swapMetaRow)

  private[graft] final case class RetrievalIndexMeta(
      epoch: Long, base: Long, nDocs: Long, totalTokens: Long,
      lastBatchId: Long = -1L)

  private[graft] def postingsDir(path: String, epoch: Long): String =
    s"$path/postings/e$epoch"

  private[graft] def docsDir(path: String, epoch: Long): String =
    s"$path/docs/e$epoch"

  private[graft] def readRetrievalIndexMeta(
      spark: SparkSession, path: String): RetrievalIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "retrieval index", "index")
    RetrievalIndexMeta(r.getAs[Long]("epoch"), r.getAs[Long]("base"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
      r.getAs[Long]("last_batch_id"))
  }

  private def swapRetrievalMeta(spark: SparkSession, path: String,
                                meta: RetrievalIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "retrieval index",
      Seq((meta.epoch, meta.base, meta.nDocs, meta.totalTokens,
          meta.lastBatchId))
        .toDF("epoch", "base", "n_docs", "total_tokens", "last_batch_id"))
  }

  private def readStoredPostings(spark: SparkSession, path: String,
                                 meta: RetrievalIndexMeta): DataFrame =
    spark.read.parquet(
      (meta.base to meta.epoch).map(postingsDir(path, _)): _*)

  private def readStoredDocs(spark: SparkSession, path: String,
                             meta: RetrievalIndexMeta): DataFrame =
    spark.read.parquet((meta.base to meta.epoch).map(docsDir(path, _)): _*)

  /** Write one epoch's postings + docs relations from a doc slice;
    * returns (docs added, tokens added). Postings sort within
    * partitions by token so parquet row-group min/max stats prune
    * probe-term scans. */
  private def writeEpoch(df: DataFrame, textCol: String, idCol: String,
                         path: String, epoch: Long): (Long, Long) = {
    val spark = df.sparkSession
    postingsWithDocLen(df, textCol, idCol)
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(postingsDir(path, epoch))
    val stored = spark.read.parquet(postingsDir(path, epoch))
    val docRel = stored.select(col("doc_id"), col("dl"))
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
    docRel.select(col("doc_id"))
      .write.mode("overwrite").parquet(docsDir(path, epoch))
    val r = docRel.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("t")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Build the persisted retrieval index from a corpus snapshot. */
  def writeRetrievalIndex(df: DataFrame, textCol: String, idCol: String,
                          path: String): Unit =
    buildRetrievalIndex(df, textCol, idCol, path, lastBatchId = -1L)

  private def buildRetrievalIndex(df: DataFrame, textCol: String,
                                  idCol: String, path: String,
                                  lastBatchId: Long): Unit = {
    val (n, t) = writeEpoch(df, textCol, idCol, path, 0L)
    swapRetrievalMeta(df.sparkSession, path,
      RetrievalIndexMeta(epoch = 0L, base = 0L, nDocs = n, totalTokens = t,
        lastBatchId = lastBatchId))
  }

  /** Append a corpus segment — the daily maintenance move. Doc ids are
    * the identity: the delta anti-joins against the stored doc-id
    * window, so a RE-DROPPED segment adds zero rows (re-drop idempotent
    * by construction) and a re-appended id keeps its STORED text.
    * Append cost is proportional to the delta plus one narrow read of
    * the stored doc ids. Meta swaps LAST: a torn append's epoch dirs
    * sit outside the window and the retry overwrites them wholesale. */
  def appendRetrievalIndex(spark: SparkSession, path: String,
                           df: DataFrame, textCol: String,
                           idCol: String): Unit = {
    val meta = readRetrievalIndexMeta(spark, path)
    appendRetrievalCore(spark, path, meta, df, textCol, idCol,
      meta.lastBatchId)
  }

  private def appendRetrievalCore(spark: SparkSession, path: String,
                                  meta: RetrievalIndexMeta, df: DataFrame,
                                  textCol: String, idCol: String,
                                  lastBatchId: Long): Unit = {
    val storedIds = readStoredDocs(spark, path, meta)
      .withColumnRenamed("doc_id", idCol)
    val delta = df.join(storedIds, Seq(idCol), "left_anti")
    val next = meta.epoch + 1
    val (n, t) = writeEpoch(delta, textCol, idCol, path, next)
    swapRetrievalMeta(spark, path,
      meta.copy(epoch = next, nDocs = meta.nDocs + n,
        totalTokens = meta.totalTokens + t, lastBatchId = lastBatchId))
  }

  /** The streaming maintenance leg — each micro-batch of landed docs
    * commits through here with its batch id recorded behind the meta
    * swap (the [[WarcOps.ingestWarcIndexBatch]] discipline). First
    * batch on an empty path builds the artifact; a torn meta swap is
    * recovered; orphan data with no recoverable meta refuses loudly.
    * Replay of the last batch skips quietly BEFORE tokenizing anything;
    * an id regressing further refuses loudly, naming the backfill
    * ([[appendRetrievalIndex]], which has no pointer and always
    * anti-joins). Returns whether the batch was applied. */
  def ingestRetrievalBatch(spark: SparkSession, path: String,
                           batch: DataFrame, textCol: String,
                           idCol: String, batchId: Long): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "retrieval index",
        s"$path/postings")
      buildRetrievalIndex(batch, textCol, idCol, path,
        lastBatchId = batchId)
      true
    } else {
      val meta = readRetrievalIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("retrieval index", path, batchId,
          meta.lastBatchId, "documents", "appendRetrievalIndex")
        false
      } else {
        appendRetrievalCore(spark, path, meta, batch, textCol, idCol,
          batchId)
        true
      }
    }
  }

  /** Compact the epoch window: rewrite both relations as ONE fresh
    * epoch at `targetFiles` and re-base the pointer — the
    * [[DedupOps.compactDigestIndex]] move, bounding the file count
    * every probe's term filter scans. Probe output is byte-identical
    * before and after (same postings, same counters). */
  def compactRetrievalIndex(spark: SparkSession, path: String,
                            targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readRetrievalIndexMeta(spark, path)
    val next = meta.epoch + 1
    readStoredPostings(spark, path, meta)
      .repartition(targetFiles)
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(postingsDir(path, next))
    readStoredDocs(spark, path, meta).coalesce(targetFiles)
      .write.mode("overwrite").parquet(docsDir(path, next))
    swapRetrievalMeta(spark, path, meta.copy(epoch = next, base = next))
    MetaIO.pruneEpochs(spark, Seq(s"$path/postings", s"$path/docs"),
      superseded = meta.base)
  }

  /** Compact when the live window has grown to `maxEpochs` dirs or
    * more — the policy wrapper the continuous maintainer calls after
    * each batch. Returns whether a compaction ran. */
  def maybeCompactRetrievalIndex(spark: SparkSession, path: String,
                                 maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readRetrievalIndexMeta(spark, path)
    if (meta.epoch - meta.base + 1 >= maxEpochs) {
      compactRetrievalIndex(spark, path)
      true
    } else false
  }

  /** Ranked retrieval against the STORED index — the serving path.
    * Output ≡ [[bm25TopK]] over the indexed corpus (same scorer, same
    * counters), at matched-postings cost: the query workload's distinct
    * terms become an `isin` literal filter on the token-sorted postings
    * relation, so parquet row-group min/max stats prune everything a
    * query never mentions, and corpus stats come from the meta row —
    * no corpus-wide job anywhere at probe time.
    *
    * The term set is collected to the driver (bounded by the query
    * WORKLOAD, not the corpus; `maxTerms` guards the literal-filter
    * size loudly — a workload past it should shard its queries). */
  def bm25AgainstStoredIndex(spark: SparkSession, path: String,
                             queries: DataFrame, queryIdCol: String,
                             queryTextCol: String, k: Int,
                             maxTerms: Int = 100000): DataFrame = {
    val meta = readRetrievalIndexMeta(spark, path)
    import spark.implicits._
    val stats = Seq((meta.nDocs, meta.totalTokens,
        1000L * meta.totalTokens / math.max(meta.nDocs, 1L)))
      .toDF("n_docs", "total_tokens", "avgdl_milli")
    val qt = queryTerms(queries, queryIdCol, queryTextCol)
    val terms = qt.select(col("token")).distinct()
      .as[String].collect().sorted
    require(terms.length <= maxTerms,
      s"bm25AgainstStoredIndex: query workload has ${terms.length} " +
        s"distinct terms, past the $maxTerms literal-filter guard — " +
        "shard the workload across probes")
    val cand = readStoredPostings(spark, path, meta)
      .filter(col("token").isin(terms.toSeq: _*))
    scoreTopK(cand, stats, qt, k)
  }
}
