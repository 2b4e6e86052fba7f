package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID (stopword-profile heuristic), quality scoring,
  * token counting, document fingerprinting.
  *
  * Design rules for 100 TB scale:
  * - everything is a columnar expression over built-in higher-order
  *   functions (built-in columnar expressions, no UDF, no shuffle) — these ops cost one map
  *   stage regardless of data size;
  * - no transcendental functions (exp/ln) so results are bit-reproducible
  *   across engines (the DuckDB oracles reproduce them exactly);
  * - integer/decimal arithmetic where possible, IEEE double division only
  *   on exact integer inputs.
  */
object TextOps {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: maximal alphanumeric runs (the regex kept to
    * a subset with identical semantics in Java regex and RE2, so the
    * oracle reproduces it). A real tokenizer plugs in here; the count is
    * the budget-estimation signal pipelines need. */
  def subtokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+"))

  def charCount(text: Column): Column = length(text)

  /** Stopword-profile language scores. Each language is scored by the
    * number of tokens that hit its profile; winner is the max score with
    * lexicographic tie-break. A real system would plug in larger profiles;
    * the operator shape (argmax over per-profile token-match counts in one
    * map stage) is the scale path. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
  )

  def langScore(text: Column, profile: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(profile.map(lit): _*)))
  }

  /** Predicted language + its score; ties break to the lexicographically
    * first language code (profiles are pre-sorted).
    *
    * Shape: argmax via array_max over (score, -profile_index, lang)
    * structs — struct ordering compares score first, then -index, so
    * ties prefer the earlier (lexicographically first) profile. The
    * earlier when()-fold duplicated the not-yet-chosen branch at every
    * step, inlining each profile's size(filter(split(...))) up to 2^k
    * times once filter pushdown copied the expression into predicates;
    * the array form keeps each profile score to ONE lexical occurrence. */
  def languageId(text: Column): Column = {
    val scored = langProfiles.zipWithIndex.map { case ((code, prof), i) =>
      struct(langScore(text, prof).as("score"), lit(-i).as("nrank"),
        lit(code).as("lang"))
    }
    array_max(array(scored: _*))
  }

  /** Quality heuristics: token count, char count, mean token length, and a
    * stopword ratio; composite linear score clamped to [0, 100]. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text).cast("long")
    val nChar = charCount(text).cast("long")
    val stop = langScore(text, langProfiles.flatMap(_._2).distinct.sorted).cast("long")
    val meanLen = (nChar - (nTok - lit(1))).cast("double") / nTok.cast("double")
    val stopRatio = stop.cast("double") / nTok.cast("double")
    val score =
      least(lit(100.0), greatest(lit(0.0),
        lit(20.0) + nTok.cast("double") * lit(0.5)
          - stopRatio * lit(30.0) + meanLen * lit(5.0)))
    Seq("n_tokens" -> nTok, "n_subtokens" -> subtokenCount(text).cast("long"),
      "n_chars" -> nChar, "n_stopwords" -> stop,
      "mean_token_len" -> meanLen, "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }

  /** Rolling polynomial fingerprint over tokens, modulo a prime so the
    * arithmetic never overflows int64 (DuckDB errors on overflow; JVM
    * wraps — staying under 2^63 keeps both engines identical):
    * fp = fold(tokens, 0, (acc, t) → (acc * 31 + hash32(t)) % 1e9+7). */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31 + HashFns.hash32(t)) % 1000000007L)

  /** Word k-gram shingles as strings; empty array when fewer than k
    * tokens (guard: sequence(0, negative) would throw). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Gopher-style repetition signals over word k-grams (Rae et al. 2021,
    * §A1.1 — "fraction of characters in the most common n-gram" family,
    * simplified to token counts): for each doc, the occurrence count of
    * its MOST FREQUENT k-gram and the duplicate fraction
    * (1 − distinct/total). High values mark boilerplate/spam loops that
    * per-doc quality scores miss. Needs the doc's shingles grouped, so
    * this is DataFrame-level: explode → count per (id, shingle) →
    * per-id rollup — two shuffles, both map-side combined (the second
    * carries only distinct (id, shingle) rows). A per-row columnar
    * form exists (list_distinct + per-element recount) but is O(n²) in
    * document length — wrong for the 100k-token tail; the relational
    * shape is linear. Docs with fewer than k tokens get (0, 0.0). */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
                      k: Int): DataFrame = {
    val sh = df.select(col(idCol),
      explode(shingles(col(textCol), k)).as("__rep_sh"))
    val perShingle = sh.groupBy(col(idCol), col("__rep_sh"))
      .agg(count(lit(1)).as("__rep_c"))
    val rolled = perShingle.groupBy(col(idCol))
      .agg(max(col("__rep_c")).as("top_ngram_count"),
        count(lit(1)).as("__rep_distinct"),
        sum(col("__rep_c")).as("__rep_total"))
      .select(col(idCol), col("top_ngram_count"),
        ((col("__rep_total") - col("__rep_distinct")).cast("double") /
          col("__rep_total").cast("double")).as("dup_ngram_frac"))
    df.join(rolled, Seq(idCol), "left")
      .withColumn("top_ngram_count", coalesce(col("top_ngram_count"), lit(0L)))
      .withColumn("dup_ngram_frac", coalesce(col("dup_ngram_frac"), lit(0.0)))
  }

  /** Corpus vocabulary: the `k` most frequent tokens with counts —
    * the input to tokenizer training and OOV analysis. Explode → one
    * partial-aggregated shuffle on the token → global top-k, which
    * Spark plans as TakeOrderedAndProject (per-partition heaps + a
    * k-row driver merge — no global sort, no single-partition window).
    * Ties break lexicographically for determinism. */
  def topKVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** Per-group corpus vocabulary: the `k` most frequent tokens WITHIN
    * each group (per language, per source) — the input to per-slice
    * tokenizer/OOV analysis, where a global top-k drowns minority
    * slices. Explode → one partial-aggregated shuffle on (group, token)
    * → per-group top-k window, pruned map-side by WindowGroupLimit (each
    * task forwards at most k rows per group — the grouped analogue of
    * [[topKVocab]]'s TakeOrderedAndProject). Ties break
    * lexicographically. */
  def topKVocabByGroup(df: DataFrame, groupCols: Seq[String], textCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "use topKVocab for the ungrouped form")
    val clash = groupCols.toSet.intersect(Set("token", "n", "rank"))
    require(clash.isEmpty, s"group columns clash with output names: $clash")
    val gs = groupCols.map(col)
    val counts = df.select(gs :+ explode(tokens(col(textCol))).as("token"): _*)
      .groupBy(gs :+ col("token"): _*).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
      .orderBy(col("n").desc, col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Benchmark decontamination screening: flag (train doc, bench doc)
    * pairs sharing at least `minOverlap` distinct word k-grams — the
    * standard n-gram-overlap test run before training on a corpus that
    * might contain evaluation data. Shingles are compared BY ROLLING
    * HASH (TokenShingleHash — one codegen'd byte pass per doc, no
    * shingle-string construction; measured 2× the whole query at sf0.1),
    * the standard hashed-n-gram screening: the ~1e-9 per-pair
    * false-positive rate from a hash collision is noise against the
    * overlap threshold. Shape: the RAW train shingle hashes join the
    * broadcast (distinct) bench hashes FIRST — a map-side filter that
    * discards every non-matching shingle before any shuffle — then
    * count DISTINCT shared hashes per pair. The only shuffled rows are
    * matching (train, bench, hash) triples; never a corpus-wide
    * distinct, never all-pairs. */
  def contaminationScreen(train: DataFrame, bench: DataFrame,
                          textCol: String, idCol: String, shingleK: Int,
                          minOverlap: Long): DataFrame = {
    def sh(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
        .as("sh"))
    sh(train, "train_id").join(broadcast(sh(bench, "bench_id").distinct()), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** [[contaminationScreen]] with a Bloom pre-screen on the train side —
    * bit-identical output (bloom filters have no false negatives and the
    * exact join re-verifies every candidate), different 100 TB memory
    * and shuffle profile. The screen above keeps the bench hash set as a
    * broadcast RELATION: ~64 bits + hashmap overhead per distinct
    * shingle on every executor, and every train shingle probes it. Here
    * the bench set is first folded into a ~10-bits/element bitmap
    * (graft.functions.BloomFilter) that rides into generated code as one
    * flat `long[]`; the raw train shingle stream is bloom-filtered
    * map-side, and only bloom-positive candidates (true matches + ~2%
    * fpp noise) reach the exact verify join. When the bench suite grows
    * past broadcast size — the held-out-eval-union case — the verify
    * join degrades to a shuffle, and the bloom is what keeps that
    * shuffle proportional to the overlap instead of to the corpus. */
  def contaminationScreenBloom(train: DataFrame, bench: DataFrame,
                               textCol: String, idCol: String, shingleK: Int,
                               minOverlap: Long, numBits: Int = 1 << 20,
                               numHashes: Int = 4): DataFrame = {
    import graft.functions.BloomFilter
    def sh(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
        .as("sh"))
    val benchSh = sh(bench, "bench_id").distinct()
    val bits = BloomFilter.build(
      benchSh.select(col("sh")).distinct(), "sh", numBits, numHashes)
    sh(train, "train_id")
      .filter(BloomFilter.mightContainCol(col("sh"), bits, numHashes, numBits))
      .join(broadcast(benchSh), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  // ---- Persisted decontamination index (build once, screen daily) --------
  //
  // The sixth artifact lifecycle: a benchmark set changes rarely, so the
  // bench shingle relation and its PRE-BUILT bloom bitmap commit as
  // immutable epoch directories behind the sideways+rename meta swap —
  // the daily screen reads ONLY stored relations (bench text never
  // re-read, shingle kernel never re-run over the bench, no bitmap
  // build job at screen time). Same discipline as the MinHash index's
  // stored bloom.

  private[graft] final case class DecontamIndexMeta(
      shingleK: Int, numBits: Int, numHashes: Int, shRows: Long,
      epoch: Long, lastBatchId: Long = -1L)

  private def decontamEpochDir(path: String, rel: String, epoch: Long): String =
    s"$path/$rel/e$epoch"

  private def swapDecontamMeta(spark: org.apache.spark.sql.SparkSession,
                               path: String, meta: DecontamIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "decontam index",
      Seq((meta.shingleK, meta.numBits, meta.numHashes, meta.shRows,
          meta.epoch, meta.lastBatchId))
        .toDF("shingle_k", "num_bits", "num_hashes", "sh_rows", "epoch",
          "last_batch_id"))
  }

  private[graft] def readDecontamIndexMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): DecontamIndexMeta = {
    // MetaIO retries once across the delete+rename swap window, so a
    // reader racing an append resolves the previous consistent epoch
    // instead of a transient "no meta" failure
    val r = MetaIO.readMetaRow(spark, path, "decontam index", "index")
    DecontamIndexMeta(r.getAs[Int]("shingle_k"), r.getAs[Int]("num_bits"),
      r.getAs[Int]("num_hashes"), r.getAs[Long]("sh_rows"),
      r.getAs[Long]("epoch"),
      // pre-streaming-format meta has no batch pointer: never-stream-fed
      if (r.schema.fieldNames.contains("last_batch_id"))
        r.getAs[Long]("last_batch_id")
      else -1L)
  }

  /** Build: ONE text pass over the bench set → distinct (bench_id, sh)
    * rows stored → bloom built from the STORED relation (the text
    * pipeline never runs twice) → meta swap last. */
  def writeDecontamIndex(bench: DataFrame, textCol: String, idCol: String,
                         path: String, shingleK: Int,
                         numBits: Int = 1 << 20, numHashes: Int = 4): Unit =
    buildDecontamIndex(bench, textCol, idCol, path, shingleK, numBits,
      numHashes, lastBatchId = -1L)

  private def buildDecontamIndex(bench: DataFrame, textCol: String,
                                 idCol: String, path: String,
                                 shingleK: Int, numBits: Int,
                                 numHashes: Int, lastBatchId: Long): Unit = {
    import graft.functions.BloomFilter
    val spark = bench.sparkSession
    bench.select(col(idCol).as("bench_id"),
        explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
          .as("sh"))
      .distinct()
      .write.mode("overwrite").parquet(decontamEpochDir(path, "shingles", 0L))
    val stored = spark.read.parquet(decontamEpochDir(path, "shingles", 0L))
    val bits = BloomFilter.build(
      stored.select(col("sh")).distinct(), "sh", numBits, numHashes)
    MetaIO.writeBloomWords(spark, bits, decontamEpochDir(path, "bloom", 0L))
    val shRows = stored.count()
    warnIfBloomSaturated(path, shRows, numBits)
    swapDecontamMeta(spark, path,
      DecontamIndexMeta(shingleK, numBits, numHashes, shRows, 0L,
        lastBatchId))
  }

  /** Loud saturation guard: the bloom's geometry is pinned at build
    * time, but appends keep folding suites in — past ~numBits/10
    * distinct shingles (< 10 bits per element) the false-positive rate
    * climbs toward 1 and the prescreen silently degrades to the
    * unfiltered verify join (correctness holds, the COST advantage is
    * gone). The remedy is a rebuild with a larger numBits; warn on the
    * way in rather than letting the screen regress without a trace. */
  private def warnIfBloomSaturated(path: String, shRows: Long,
                                   numBits: Int): Unit = {
    val capacity = numBits / 10L
    if (shRows > capacity)
      System.err.println(
        s"[graft] decontam index at $path: $shRows distinct shingles " +
          s"exceed the $numBits-bit bloom's design capacity (~$capacity " +
          "at 10 bits/element) — the prescreen's false-positive rate is " +
          "degrading toward pass-everything; rebuild with writeDecontamIndex " +
          "and a larger numBits")
  }

  /** Fold a NEW benchmark suite into the stored index: the delta's
    * distinct shingles union-distinct with the stored relation into a
    * new immutable epoch, the bloom rebuilds from the (bounded,
    * broadcast-sized) merged relation, meta swaps last — readers racing
    * an append resolve a consistent epoch. One text pass over the DELTA
    * only; the stored relation is consulted as shingle rows, never as
    * text. */
  def appendDecontamIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, bench: DataFrame,
                          textCol: String, idCol: String): Unit = {
    val meta = readDecontamIndexMeta(spark, path)
    appendDecontamCore(spark, path, meta, bench, textCol, idCol,
      meta.lastBatchId)
  }

  private def appendDecontamCore(spark: org.apache.spark.sql.SparkSession,
                                 path: String, meta: DecontamIndexMeta,
                                 bench: DataFrame, textCol: String,
                                 idCol: String, lastBatchId: Long): Unit = {
    import graft.functions.BloomFilter
    val next = meta.epoch + 1
    val delta = bench.select(col(idCol).as("bench_id"),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), meta.shingleK))
        .as("sh"))
    spark.read.parquet(decontamEpochDir(path, "shingles", meta.epoch))
      .unionByName(delta).distinct()
      .write.mode("overwrite").parquet(decontamEpochDir(path, "shingles", next))
    val merged = spark.read.parquet(decontamEpochDir(path, "shingles", next))
    val bits = BloomFilter.build(
      merged.select(col("sh")).distinct(), "sh", meta.numBits, meta.numHashes)
    MetaIO.writeBloomWords(spark, bits, decontamEpochDir(path, "bloom", next))
    val shRows = merged.count()
    warnIfBloomSaturated(path, shRows, meta.numBits)
    swapDecontamMeta(spark, path,
      meta.copy(shRows = shRows, epoch = next, lastBatchId = lastBatchId))
    // epoch GC (the MinHash-index discipline): the superseded epoch
    // stays for in-flight-probe grace, everything older goes — without
    // this, daily appends leak one full shingle+bloom copy per day
    MetaIO.pruneEpochs(spark,
      Seq(s"$path/shingles", s"$path/bloom"), superseded = meta.epoch)
  }

  /** The decontamination index's STREAMING maintenance leg — the
    * foreachBatch body of a continuous benchmark feed (new suites
    * landing as they are adopted), completing the maintenance symmetry
    * across the stored artifacts. The shingle relation is
    * distinct-union idempotent and the bloom OR-idempotent, so a
    * replayed batch is a DATA no-op regardless; the applied batch id
    * behind the meta swap additionally spares the replay its text pass
    * and empty epoch commit. First batch on an empty path builds the
    * artifact (geometry params apply ONLY then — an existing index's
    * meta pins its own); a torn meta swap is RECOVERED; shingle epochs
    * with no recoverable meta are refused loudly. Returns whether the
    * batch was applied.
    *
    * SINGLE-WRITER, NON-DECREASING batch ids: a replay at or one below
    * the stored pointer skips quietly; an id regressing further is a
    * reset checkpoint or second maintainer and REFUSES loudly, naming
    * the backfill ([[appendDecontamIndex]], which has no pointer and
    * is idempotent by construction). */
  def ingestDecontamBatch(spark: org.apache.spark.sql.SparkSession,
                          path: String, bench: DataFrame,
                          textCol: String, idCol: String, batchId: Long,
                          shingleK: Int = 3, numBits: Int = 1 << 20,
                          numHashes: Int = 4): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "decontam index",
        s"$path/shingles")
      buildDecontamIndex(bench, textCol, idCol, path, shingleK, numBits,
        numHashes, lastBatchId = batchId)
      true
    } else {
      val meta = readDecontamIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("decontam index", path,
          batchId, meta.lastBatchId, "suites", "appendDecontamIndex")
        false // replayed batch: no-op
      } else {
        appendDecontamCore(spark, path, meta, bench, textCol, idCol,
          batchId)
        true
      }
    }
  }

  /** The daily screen against the STORED index: geometry from meta, the
    * bloom bitmap read back as a codegen literal (≤ numBits/8 bytes),
    * the verify join against the stored shingle relation — output ≡
    * [[contaminationScreenBloom]] over the same bench set (pinned by
    * spec and by the shared registry oracle). */
  def screenAgainstStoredDecontam(spark: org.apache.spark.sql.SparkSession,
                                  path: String, train: DataFrame,
                                  textCol: String, idCol: String,
                                  minOverlap: Long): DataFrame = {
    import graft.functions.BloomFilter
    val meta = readDecontamIndexMeta(spark, path)
    val words = MetaIO.readBloomWords(spark,
      decontamEpochDir(path, "bloom", meta.epoch), meta.numBits)
    // the bench relation is BROADCAST-SIZED by the decontamination
    // contract (a benchmark suite, not a corpus) — collect it once and
    // rebuild a literal frame (the probeIvfIndex pattern): a parquet
    // scan here would receive the bloom predicate through join-key
    // constraint inference and evaluate the kernel inside the scan's
    // DataFilters (the double-eval class PlanAuditSpec flags)
    val benchPlan = spark.read
      .parquet(decontamEpochDir(path, "shingles", meta.epoch))
    val benchRows = benchPlan.collect()
    require(benchRows.length == meta.shRows,
      s"decontam index at $path: epoch ${meta.epoch} holds " +
        s"${benchRows.length} shingle rows but meta pins ${meta.shRows} — " +
        "incomplete or corrupt")
    val benchSh = spark.createDataFrame(
      java.util.Arrays.asList(benchRows: _*), benchPlan.schema)
    val trainSh = train.select(col(idCol).as("train_id"),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), meta.shingleK))
        .as("sh"))
    trainSh
      .filter(BloomFilter.mightContainCol(col("sh"), words,
        meta.numHashes, meta.numBits))
      .join(broadcast(benchSh), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Per-train-doc contamination FRACTION — the ranked companion to the
    * boolean [[contaminationScreen]]: for every train doc with at least
    * one shingle, how many of its distinct k-gram hashes appear in the
    * bench set at all (any bench doc), and what fraction of the doc that
    * covers. The screen answers "which pairs overlap ≥ t"; this ranks
    * docs by HOW contaminated they are, which is what a removal-budget
    * decision actually needs. Same scale shape as the screen: distinct
    * per-doc shingle hashes, broadcast bench hash set, map-side semi
    * filter before the only shuffle (the per-doc count). Docs with
    * fewer than k tokens have no shingles and are excluded (a
    * contamination fraction over zero shingles is undefined). */
  def contaminationScore(train: DataFrame, bench: DataFrame,
                         textCol: String, idCol: String,
                         shingleK: Int): DataFrame = {
    val trainSh = train.select(col(idCol),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
        .as("__ct_sh")).distinct()
    val benchSh = bench.select(
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
        .as("__ct_sh")).distinct()
    val perDoc = trainSh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    val overlap = trainSh.join(broadcast(benchSh), "__ct_sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    perDoc.join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("contamination_frac"))
  }

  /** Inverted index over the corpus: one row per (token, posting) with
    * the token's document frequency, total term frequency, and the
    * posting's rank within the CAPPED posting list (the `maxPostings`
    * smallest doc ids — deterministic, and the cap is what keeps output
    * bounded when a stopword appears in every document; df/tf still
    * count everything). The audit artifact behind decontamination
    * forensics and targeted corpus search: "which docs contain this
    * leaked string's tokens" without re-scanning text. Scalar rows, not
    * an array column, so any downstream engine can hash/sort the output.
    *
    * Shape: explode → per-(token, doc) partial-aggregated count (the
    * only corpus-sized shuffle) → ONE per-token aggregation whose
    * posting selection is a bounded min-K heap
    * ([[graft.functions.LongMinK]]) — O(maxPostings) state per group,
    * combined map-side, so a stopword token costs the same k-slot
    * buffer as any other token instead of funnelling ~n_docs rows into
    * a single window-sort task. No WindowExec anywhere in the plan. At
    * 100 TB the output is vocabulary-sized, postings are capped, and
    * every aggregation combines map-side. */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
                    maxPostings: Int, minDf: Long = 1L): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val perDoc = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        graft.functions.LongMinK.minK(col("doc_id"), maxPostings)
          .as("__postings"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df"), col("tf_total"),
        posexplode(col("__postings")).as(Seq("__pos", "doc_id")))
      .select(col("token"), col("df"), col("tf_total"),
        (col("__pos") + 1).cast("long").as("post_rank"), col("doc_id"))
  }

  /** N-gram familiarity — the integer-exact stand-in for LM-perplexity
    * quality scoring (the CCNet/Gopher filtering signal, without a
    * language model): per doc, corpus-frequency statistics of its word
    * `k`-grams. A doc whose k-grams are corpus-frequent reads like the
    * corpus (a low-perplexity doc); one full of corpus-unique k-grams
    * is novel, garbled, or machine-generated junk. Every signal is pure
    * integer arithmetic (counts and integral-div permilles — no log, no
    * FP accumulation), so the score is bit-reproducible at any
    * parallelism. Emitted per doc: `n_ngrams`, `mean_freq_permille`
    * (1000·Σ corpus-count / n_ngrams, occurrence-weighted — repeating a
    * frequent k-gram raises it like a repeated phrase lowers
    * perplexity) and `unique_frac_permille` (1000·|k-grams with corpus
    * count 1| / n_ngrams — the OOV/novelty tail). Docs with fewer than
    * `k` tokens emit (0, 0, 0).
    *
    * Shape: rolling-hash shingles (the TokenShingleHash kernel — one
    * pass, no string materialization) → ONE partial-aggregated shuffle
    * for corpus counts → equi-join back on the hash → per-doc rollup
    * (partial-aggregated). The join is keyed by shingle hash, and a
    * stopword k-gram's partition carries ~n_docs rows — the
    * [[distinctiveTerms]] skew class, handled the same way: AQE
    * skew-join splitting (a JOIN gets split; a window would not). The
    * shingle relation is consumed twice (counts + join back), which
    * re-runs the map-side kernel rather than materializing an
    * n_shingles-row intermediate — recompute is a projection, the
    * materialization would be corpus-sized. */
  def ngramFamiliarity(df: DataFrame, textCol: String, idCol: String,
                       k: Int): DataFrame = {
    val sh = df.select(col(idCol),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), k))
        .as("__nf_sh"))
    val counts = sh.groupBy(col("__nf_sh")).agg(count(lit(1)).as("__nf_c"))
    val perDoc = sh.join(counts, "__nf_sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(col("__nf_c")).as("__nf_tot"),
        sum(when(col("__nf_c") === 1L, 1L).otherwise(0L)).as("__nf_uni"))
      .select(col(idCol), col("n_ngrams"),
        call_function("div", col("__nf_tot") * 1000, col("n_ngrams"))
          .as("mean_freq_permille"),
        call_function("div", col("__nf_uni") * 1000, col("n_ngrams"))
          .as("unique_frac_permille"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("mean_freq_permille"), lit(0L)).as("mean_freq_permille"),
        coalesce(col("unique_frac_permille"), lit(0L)).as("unique_frac_permille"))
  }

  /** Smoothed bigram language-model quality score — the CCNet-style
    * "how much does a reference slice's LM like this document" signal
    * (Wenzek et al. 2019, arXiv:1911.00359, which buckets Common Crawl
    * by a Wikipedia-trained LM's perplexity). The model is add-one
    * bigram MLE over the `trainPred` slice:
    *
    *   p(w2 | w1) = (c2(w1,w2) + 1) / (c1(w1) + V)
    *
    * with c2 = train bigram count, c1 = count of w1 as a bigram context
    * (= Σ_w2 c2), and V = the count of distinct train contexts. Each
    * document is scored by the MEAN smoothed continuation probability of
    * its bigrams in fixed-point (`scale` = parts-per-million): unlike
    * log-perplexity this needs no transcendentals, so the DuckDB oracle
    * matches bit-for-bit (cross-engine libm ln() is not hash-stable),
    * while ordering documents the same way for the head/middle/tail
    * bucketing a consumer applies downstream ([[ngramFamiliarity]] is
    * the UNCONDITIONAL corpus-frequency cousin; this one scores
    * cross-slice generalization of token TRANSITIONS).
    *
    * Shape at 100 TB: ONE codegen'd shingle pass over the corpus (the
    * (ctx, big) pair relation is localCheckpointed, the
    * [[maskRepeatedSpans]] discipline), one partial-aggregated groupBy
    * for the bigram counts, c1 and V derived from that compact counts
    * relation (never a second corpus pass), then count-table joins that
    * AQE broadcasts when the train vocabulary is small. All int64.
    *
    * Unknown contexts score scale/(0+V) — the uniform-over-vocab floor;
    * docs with < 2 tokens have no bigrams and score 0 by convention. */
  def bigramLmScore(df: DataFrame, textCol: String, idCol: String,
                    trainPred: Column, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1000L, s"scale must be >= 1000, got $scale")
    val pairs = lmPairsOf(df, textCol, idCol, Seq(trainPred.as("__lm_tr")))
      .localCheckpoint()
    val c2 = pairs.filter(col("__lm_tr"))
      .groupBy(col("__ctx"), col("__big")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__ctx")).agg(sum(col("__c2")).as("__c1"))
    // V rides a ONE-ROW broadcast (Catalyst rewrites any constant-key
    // equi join here back to a nested loop, and for a single-row build
    // side that IS the optimal plan — allow-listed in PlanAuditSpec
    // with this justification)
    val vocab = c1.agg(count(lit(1)).as("__v"))
    // DE-SKEW: the scoring join's probe side is pre-aggregated to one
    // row per (doc, bigram) with its in-doc multiplicity — shrinking
    // the join input from token count to distinct-bigrams-per-doc, so
    // a document repeating one stopword bigram thousands of times
    // contributes ONE join row, not thousands. The pre-aggregation
    // shuffle is keyed by (id, ctx, big) — id makes it uniform, so it
    // cannot itself skew. The residual cross-DOC skew (a stopword
    // bigram appearing once in every doc still has one row per doc on
    // that key) is bounded by corpus doc count per key and handled by
    // AQE's skew-join split when the count relation outgrows broadcast
    // — the same documented reliance as ngramFamiliarity; LmSkewSpec
    // pins the within-doc half structurally.
    val perDoc = pairs.groupBy(col(idCol), col("__ctx"), col("__big"))
      .agg(count(lit(1)).as("__mult"))
    val terms = perDoc
      .join(c2, Seq("__ctx", "__big"), "left")
      .join(c1, Seq("__ctx"), "left")
      .crossJoin(broadcast(vocab))
      // lazy loud guard (the snapshotDiff discipline): an empty train
      // slice means V=0 — no model — and the add-one denominator would
      // hit ANSI divide-by-zero; fail with intent instead
      .filter(assert_true(col("__v") > 0,
        lit("bigramLmScore: empty train slice (V=0) — trainPred matched " +
          "no documents with at least one bigram; there is no model to " +
          "score against")).isNull)
      .select(col(idCol),
        lmTerm(col("__c2"), col("__c1"), col("__v"), scale).as("__term"),
        col("__mult"))
    lmAggregate(df, idCol, terms)
  }

  /** The bigram pair relation behind every LM-score surface: one
    * codegen'd shingle pass emitting (id, extra..., ctx, big) rows —
    * ctx = the hash of the bigram's first token, big = the combined
    * bigram hash. */
  private[graft] def lmPairsOf(df: DataFrame, textCol: String, idCol: String,
                                  extra: Seq[Column] = Nil,
                                  outer: Boolean = false): DataFrame = {
    import graft.functions.TokenShingleHash
    val u = TokenShingleHash.shingleHashes(col(textCol), 1)
    val b = TokenShingleHash.shingleHashes(col(textCol), 2)
    val z = zip_with(slice(u, lit(1), size(u) - 1), b,
      (c, g) => struct(c.as("ctx"), g.as("big")))
    // outer: docs with no bigrams (or null text) keep ONE null row, so a
    // stateless streaming consumer still emits their zero-score row
    val ex = if (outer) explode_outer(z) else explode(z)
    df.select(col(idCol) +: extra :+ ex.as("__lm"): _*)
      .withColumn("__ctx", col("__lm.ctx"))
      .withColumn("__big", col("__lm.big"))
      .drop("__lm")
  }

  /** The add-one smoothed fixed-point term p(w2|w1)·scale (unaliased). */
  private[graft] def lmTerm(c2: Column, c1: Column, v: Column,
                               scale: Long): Column =
    call_function("div",
      (coalesce(c2, lit(0L)) + lit(1L)) * lit(scale),
      coalesce(c1, lit(0L)) + v)

  /** Per-doc fold of (term, multiplicity) rows + restore of
    * zero-bigram docs: terms arrive pre-aggregated to one row per
    * (doc, bigram) with `__mult` occurrences (the de-skew contract),
    * so the fold weights by multiplicity — bit-identical to summing
    * one row per occurrence since the term depends only on the
    * bigram. */
  private def lmAggregate(df: DataFrame, idCol: String,
                          terms: DataFrame): DataFrame = {
    val perDoc = terms.groupBy(col(idCol))
      .agg(sum(col("__mult")).as("n_bigrams"),
        sum(col("__term") * col("__mult")).as("score_sum"))
      .select(col(idCol), col("n_bigrams"), col("score_sum"),
        call_function("div", col("score_sum"), col("n_bigrams"))
          .as("avg_score"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"),
        coalesce(col("avg_score"), lit(0L)).as("avg_score"))
  }

  // ---- Persisted bigram LM model (train weekly, score daily) -------------
  //
  // The LM counts are a serving asset like the MinHash index and the
  // k-means centroid model: the weekly train pass commits (ctx, big)
  // counts + derived context totals as IMMUTABLE epoch directories with
  // the meta (v, epoch, counts) pointer swapped sideways+rename LAST,
  // and the daily scoring pass — batch or streaming — reads ONLY the
  // stored relations: the train corpus text is never re-read and the
  // count aggregation never re-runs. Counts are sum-mergeable, so
  // appends fold a DELTA-sized count relation into the stored one.

  /** The model's meta row: vocabulary size pin + epoch pointer +
    * completeness counts + the last applied streaming batch id
    * ([[ingestLmBatch]]; -1 = never stream-fed, batch-API appends
    * leave it untouched). */
  private[graft] final case class LmModelMeta(
      v: Long, c2Rows: Long, epoch: Long, lastBatchId: Long = -1L)

  private def lmEpochDir(path: String, rel: String, epoch: Long): String =
    s"$path/$rel/e$epoch"

  private def swapLmMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String, meta: LmModelMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "lm model",
      Seq((meta.v, meta.c2Rows, meta.epoch, meta.lastBatchId))
        .toDF("v", "c2_rows", "epoch", "last_batch_id"))
  }

  private[graft] def readLmModelMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): LmModelMeta = {
    val r = MetaIO.readMetaRow(spark, path, "lm model", "model")
    LmModelMeta(r.getAs[Long]("v"), r.getAs[Long]("c2_rows"),
      r.getAs[Long]("epoch"),
      // pre-streaming-format meta has no batch pointer: never-stream-fed
      if (r.schema.fieldNames.contains("last_batch_id"))
        r.getAs[Long]("last_batch_id")
      else -1L)
  }

  /** Commit bigram counts from one epoch's count relation: derives the
    * context totals + vocabulary from the (already narrow) counts —
    * never from text — writes the epoch's COVERED-DOC relation (the
    * re-drop anti-join's key set: one id per doc ever folded, the
    * walked-relation pattern — counts are value folds with no row
    * identity of their own, so without this a twice-landed segment
    * double-weights its bigrams), and swaps meta last. */
  private def commitLmEpoch(spark: org.apache.spark.sql.SparkSession,
                            path: String, c2: DataFrame, docs: DataFrame,
                            epoch: Long, lastBatchId: Long): Unit = {
    c2.write.mode("overwrite").parquet(lmEpochDir(path, "counts", epoch))
    docs.select(col("id").cast("long").as("id")).distinct()
      .write.mode("overwrite").parquet(lmEpochDir(path, "docs", epoch))
    val stored = spark.read.parquet(lmEpochDir(path, "counts", epoch))
    stored.groupBy(col("ctx"))
      .agg(sum(col("n")).cast("long").as("n"))
      .write.mode("overwrite").parquet(lmEpochDir(path, "ctx", epoch))
    val ctxRel = spark.read.parquet(lmEpochDir(path, "ctx", epoch))
    val v = ctxRel.count()
    require(v > 0, "lm model: empty train slice — no bigrams to count")
    swapLmMeta(spark, path, LmModelMeta(v, stored.count(), epoch,
      lastBatchId))
    // epoch GC after the swap: keep the superseded epoch for
    // in-flight-scorer grace, delete older — append- or compact-
    // heavy deployments otherwise hold every count relation ever
    // written (~11.8M rows per epoch at the 500k-doc soak scale).
    // Epochs advance by exactly 1, so the commit of `epoch` supersedes
    // `epoch - 1`; the initial commit (epoch 0) passes -1 → no-op.
    MetaIO.pruneEpochs(spark,
      Seq(s"$path/counts", s"$path/ctx", s"$path/docs"),
      superseded = epoch - 1)
  }

  /** The epoch's covered-doc ids; a PRE-UPGRADE epoch has no docs
    * relation — read it as empty, so legacy artifacts keep appending
    * exactly as before (re-drop protection covers docs folded after
    * the upgrade; the old format could not remember earlier ones). */
  private def readLmDocs(spark: org.apache.spark.sql.SparkSession,
                         path: String, epoch: Long): DataFrame = {
    val d = new org.apache.hadoop.fs.Path(lmEpochDir(path, "docs", epoch))
    if (d.getFileSystem(spark.sessionState.newHadoopConf()).exists(d))
      spark.read.parquet(d.toString)
    else spark.range(0).select(col("id"))
  }

  /** Train-and-persist: ONE codegen'd text pass over the train slice →
    * one partial-aggregated count shuffle → epoch 0 commit. */
  def writeLmModel(train: DataFrame, textCol: String, idCol: String,
                   path: String): Unit =
    buildLmModel(train, textCol, idCol, path, lastBatchId = -1L)

  private def buildLmModel(train: DataFrame, textCol: String,
                           idCol: String, path: String,
                           lastBatchId: Long): Unit = {
    val c2 = lmPairsOf(train, textCol, idCol)
      .groupBy(col("__ctx").as("ctx"), col("__big").as("big"))
      .agg(count(lit(1)).cast("long").as("n"))
    commitLmEpoch(train.sparkSession, path, c2,
      train.select(col(idCol).as("id")), epoch = 0L,
      lastBatchId = lastBatchId)
  }

  /** Fold a new train slice into the stored model: the DELTA's counts
    * merge with the stored relation by key (sum-mergeable, the MinHash
    * delta-append argument) into a NEW immutable epoch; readers racing
    * the append keep resolving the previous epoch until the meta swap.
    * Cost: one text pass over the DELTA plus one count-relation-sized
    * merge groupBy — never a re-read of earlier train text. */
  def appendLmModel(spark: org.apache.spark.sql.SparkSession, path: String,
                    train: DataFrame, textCol: String, idCol: String): Unit = {
    val meta = readLmModelMeta(spark, path)
    appendLmCore(spark, path, meta, train, textCol, idCol,
      meta.lastBatchId)
  }

  private def appendLmCore(spark: org.apache.spark.sql.SparkSession,
                           path: String, meta: LmModelMeta,
                           train: DataFrame, textCol: String,
                           idCol: String, lastBatchId: Long): Unit = {
    // docs already folded are SKIPPED before any text is tokenized —
    // counts are value folds with no row identity, so a re-dropped
    // segment would otherwise double-weight its bigrams silently
    val covered = readLmDocs(spark, path, meta.epoch)
    val fresh = train.join(covered.select(col("id").as("__lm_seen")),
      train(idCol) === col("__lm_seen"), "left_anti")
    val delta = lmPairsOf(fresh, textCol, idCol)
      .groupBy(col("__ctx").as("ctx"), col("__big").as("big"))
      .agg(count(lit(1)).cast("long").as("n"))
    val merged = spark.read.parquet(lmEpochDir(path, "counts", meta.epoch))
      .unionByName(delta)
      .groupBy(col("ctx"), col("big"))
      .agg(sum(col("n")).cast("long").as("n"))
    commitLmEpoch(spark, path, merged,
      covered.unionByName(fresh.select(col(idCol).as("id"))),
      meta.epoch + 1, lastBatchId)
  }

  /** The model's STREAMING maintenance leg — the foreachBatch body of
    * a continuous training-corpus feed, completing the maintenance
    * symmetry with the WARC/media-hash/quantile/HLL artifacts: each
    * micro-batch of documents folds in exactly-once across
    * crash/replay through the applied batch id recorded behind the
    * same meta swap as the epoch pointer (the
    * [[graft.pipeline.WarcOps.ingestWarcIndexBatch]] discipline). The
    * covered-docs anti-join already makes any replay a DATA no-op;
    * the pointer additionally spares it the text pass and the empty
    * epoch commit. First batch on an empty path builds the artifact
    * (a first batch with NO bigrams defers the build — nothing is
    * committed and false returns, so the artifact appears with the
    * first real data); a path whose meta is missing because a swap
    * died mid-commit is RECOVERED, and count relations with no
    * recoverable meta are refused loudly — never rebuilt over.
    * Returns whether the batch was applied.
    *
    * SINGLE-WRITER, NON-DECREASING batch ids: a replay at or one below
    * the stored pointer skips quietly (the crash-replay signature); an
    * id regressing further is a reset checkpoint or a second
    * maintainer and REFUSES loudly, naming the backfill
    * ([[appendLmModel]], which has no pointer and always anti-joins). */
  def ingestLmBatch(spark: org.apache.spark.sql.SparkSession,
                    path: String, batch: DataFrame, textCol: String,
                    idCol: String, batchId: Long): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "lm model", s"$path/counts")
      // a bigram-free first batch cannot commit (the model pins V > 0):
      // defer the build to the first batch that carries data — the
      // replay of THIS batch is a no-op either way (nothing committed).
      // The pairs checkpoint ONCE and feed both the emptiness check and
      // the commit — a plain isEmpty would pay the full tokenize pass a
      // second time when the build runs.
      val c2 = lmPairsOf(batch, textCol, idCol)
        .groupBy(col("__ctx").as("ctx"), col("__big").as("big"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint()
      try {
        if (c2.isEmpty) false
        else {
          commitLmEpoch(spark, path, c2,
            batch.select(col(idCol).as("id")), epoch = 0L,
            lastBatchId = batchId)
          true
        }
      } finally c2.unpersist()
    } else {
      val meta = readLmModelMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("lm model", path, batchId,
          meta.lastBatchId, "documents", "appendLmModel")
        false // replayed batch: no-op
      } else {
        appendLmCore(spark, path, meta, batch, textCol, idCol, batchId)
        true
      }
    }
  }

  /** Compact the stored count relations: repeated appends leave the
    * current epoch's counts spread across many small files; compaction
    * rewrites them into a fresh epoch at `targetFiles` (the IVF-PQ
    * index's compact step, same sibling-epoch + meta-swap discipline).
    * Scores are unchanged by construction — the relation content is
    * identical, only the file layout moves. */
  def compactLmModel(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readLmModelMeta(spark, path)
    val c2 = spark.read.parquet(lmEpochDir(path, "counts", meta.epoch))
      .coalesce(targetFiles)
    commitLmEpoch(spark, path, c2,
      readLmDocs(spark, path, meta.epoch), meta.epoch + 1,
      meta.lastBatchId)
  }

  /** The daily scoring pass against the STORED model: pairs of the
    * scored corpus join the stored count relations (AQE broadcasts
    * them when the train vocabulary is small), V comes from meta as a
    * plan literal — no training scan, no count job, no one-row
    * broadcast. Output ≡ [[bigramLmScore]] given the same train slice
    * (pinned by LmScoreSpec). */
  def scoreAgainstStoredLm(spark: org.apache.spark.sql.SparkSession,
                           path: String, df: DataFrame, textCol: String,
                           idCol: String, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1000L, s"scale must be >= 1000, got $scale")
    val meta = readLmModelMeta(spark, path)
    val c2 = spark.read.parquet(lmEpochDir(path, "counts", meta.epoch))
      .select(col("ctx").as("__ctx"), col("big").as("__big"),
        col("n").as("__c2"))
    val c1 = spark.read.parquet(lmEpochDir(path, "ctx", meta.epoch))
      .select(col("ctx").as("__ctx"), col("n").as("__c1"))
    // same de-skew pre-aggregation as [[bigramLmScore]]: one join row
    // per (doc, bigram), weighted by in-doc multiplicity
    val perDocPairs = lmPairsOf(df, textCol, idCol)
      .groupBy(col(idCol), col("__ctx"), col("__big"))
      .agg(count(lit(1)).as("__mult"))
    val terms = perDocPairs
      .join(c2, Seq("__ctx", "__big"), "left")
      .join(c1, Seq("__ctx"), "left")
      .select(col(idCol),
        lmTerm(col("__c2"), col("__c1"), lit(meta.v), scale).as("__term"),
        col("__mult"))
    lmAggregate(df, idCol, terms)
  }

  /** DSIR-style data-selection importance weights (Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023, arXiv:2302.03169): hashed-bigram features, add-one-smoothed
    * TARGET vs RAW distributions, each document weighted by how much
    * the target model prefers its features. Fixed-point surrogate: the
    * per-feature probability ratio
    *
    *   r(f) = (c_t(f)+1)·(N_r+B) / ((c_r(f)+1)·(N_t+B))   [in ppm]
    *
    * and the document weight is the MEAN ratio over its features
    * (DSIR sums log-ratios; the mean-ratio surrogate ranks target-like
    * documents above raw-like ones for the same reason and needs no
    * transcendentals, so the DuckDB oracle matches bit-for-bit — a
    * consumer wanting the exact log weight can take logs offline).
    * Raw = the WHOLE corpus (the crawl being filtered), target = the
    * `targetPred` slice, exactly the paper's setup.
    *
    * Scale shape: one codegen'd shingle pass (checkpointed narrow
    * (id, tgt, bucket) rows), then a groupBy whose key cardinality is
    * ≤ `buckets` BY CONSTRUCTION — the count table is a bounded
    * planning constant like the k-means centroid snapshot, so the
    * ratios compute driver-side in BigInt (no int64 overflow at any
    * corpus size) and rejoin as a broadcast literal; the scoring pass
    * is map-only + one per-doc partial agg. */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
                  targetPred: Column, buckets: Int = 4096,
                  scale: Long = 1000000L): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    require(scale >= 1000L, s"scale must be >= 1000, got $scale")
    import graft.functions.TokenShingleHash
    val rows = df.select(col(idCol), targetPred.as("__ds_tgt"),
        explode(TokenShingleHash.shingleHashes(col(textCol), 2)).as("__ds_h"))
      .select(col(idCol), col("__ds_tgt"),
        pmod(col("__ds_h"), lit(buckets.toLong)).as("__ds_f"))
      .localCheckpoint()
    val counts = rows.groupBy(col("__ds_f"))
      .agg(count(lit(1)).as("__ds_call"),
        sum(when(col("__ds_tgt"), 1L).otherwise(0L)).as("__ds_ct"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nR = BigInt(counts.map(_._2).sum) + buckets
    val nT = BigInt(counts.map(_._3).sum) + buckets
    val spark = df.sparkSession
    import spark.implicits._
    val ratios = counts.toSeq.map { case (f, cAll, cT) =>
      val r = (BigInt(cT + 1) * nR * scale) / (BigInt(cAll + 1) * nT)
      require(r.isValidLong,
        s"dsirWeights: ratio for bucket $f overflows int64 — lower scale")
      (f, r.toLong)
    }.toDF("__ds_f", "__ds_r")
    val perDoc = rows.join(broadcast(ratios), Seq("__ds_f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__ds_r")).as("__ds_sum"))
      .select(col(idCol), col("n_feats"),
        call_function("div", col("__ds_sum"), col("n_feats"))
          .as("mean_ratio_ppm"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("mean_ratio_ppm"), lit(0L)).as("mean_ratio_ppm"))
  }

  /** Canonical text form for near-exact dedup: lowercase, every
    * non-alphanumeric run collapsed to one space, trimmed. Catches the
    * re-encoded copies exact dedup misses (case changes, punctuation
    * swaps, whitespace reflow) while staying a pure map-only expression
    * — no pair join, no signature. The character classes are the
    * Java-regex/RE2 common subset, so the oracle reproduces the
    * normalization exactly; a production pipeline would extend the
    * pattern pack at this seam (Unicode folding, HTML entities). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Per-doc distinctive terms — integer TF-IDF: each doc's top `k`
    * tokens ranked by (rarest corpus document-frequency first, then
    * highest in-doc term-frequency, then token). Deliberately
    * transcendental-free: the (df ASC, tf DESC) lexicographic rank
    * selects the same terms as tf·log(N/df) whenever df differs, and
    * resolves equal-df ties by tf exactly as the formula does — while
    * staying bit-reproducible across engines (no log, no FP weights).
    * Shape: explode → per-(doc, token) counts (one partial-aggregated
    * shuffle) → document frequencies from the SAME relation (second
    * partial-aggregated shuffle over distinct doc-token rows, vocab-
    * sized output) → broadcast-join df back (vocab is small relative to
    * the corpus; Spark's AQE demotes to shuffle join if not) → per-doc
    * top-k window, pruned map-side by WindowGroupLimit.
    *
    * Known skew hazard when the join DOES demote to sort-merge: the
    * tf side is keyed by token, and stopword tokens appear in nearly
    * every document, so their join partitions carry ~n_docs rows. That
    * is exactly the shape AQE's skew-join splitting handles
    * (spark.sql.adaptive.skewJoin, on by default here); corpora beyond
    * it should pre-filter the stop set — a stopword's df rank never
    * reaches a top-k anyway. */
  def distinctiveTerms(df: DataFrame, textCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!Set("token", "tf", "df", "rank").contains(idCol),
      s"idCol clashes with an output name: $idCol")
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("df"), col("tf").desc, col("token"))
    tf.join(dfreq, "token")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank"))
  }

  /** Inter-document boilerplate score — the corpus-common-content
    * signal ([[repetitionStats]] is the INTRA-doc twin): a k-gram is
    * "boilerplate" when it appears in at least `minDocs` distinct
    * documents (navigation chrome, license headers, templates); each
    * doc is scored by the fraction of its distinct k-gram hashes that
    * are boilerplate. Scale shape mirrors the decontamination screen:
    * the boilerplate set is derived with one partial-aggregated shuffle
    * over distinct (doc, hash) rows, is SMALL by construction (only
    * hashes crossing the threshold survive), and is broadcast back —
    * the scoring pass is a map-side semi-join + one per-doc count. Docs
    * with fewer than k tokens have no shingles and are excluded. */
  def boilerplateScore(df: DataFrame, textCol: String, idCol: String,
                       shingleK: Int, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val sh = df.select(col(idCol),
      explode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK))
        .as("__bp_sh")).distinct()
    val common = sh.groupBy(col("__bp_sh"))
      .agg(count(lit(1)).as("__bp_df"))
      .filter(col("__bp_df") >= minDocs)
      .select(col("__bp_sh"))
    val perDoc = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hit = sh.join(broadcast(common), "__bp_sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_common"))
    perDoc.join(hit, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("common_frac"))
  }

  /** Hashed bag-of-words features (the "hashing trick", Weinberger et
    * al. 2009, arXiv:0902.2206): each token lands in bucket
    * polyHash(token) mod dim, and a document's feature vector is its
    * per-bucket token counts — emitted as SCALAR rows (id, dim, n)
    * rather than an array column, ready to assemble into whatever
    * vector shape a consumer wants. This is the model-free bridge from
    * raw text into every embedding-space operator in the engine
    * (k-means cells, ANN, semantic dedup, outlier flags): no trained
    * model, no vocabulary table, deterministic on both engines.
    * One explode + one partial-aggregated groupBy — linear, and the
    * shuffle carries (id, bucket) pairs only. Buckets with no tokens
    * emit no row (sparse by construction); empty/null text emits
    * nothing. */
  def hashedBowFeatures(df: DataFrame, textCol: String, idCol: String,
                        dim: Int): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim")
    df.select(col(idCol),
        explode(tokens(col(textCol))).as("__hb_tok"))
      .filter(length(col("__hb_tok")) > 0)
      .groupBy(col(idCol),
        pmod(graft.functions.StringPolyHash.polyHash(col("__hb_tok")),
          lit(dim.toLong)).as("dim"))
      .agg(count(lit(1)).as("n"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): the min shingle hash of every `w`-window of
    * consecutive k-shingle hashes, deduplicated per doc — the robust
    * LOCAL fingerprint set behind MOSS-style overlap detection. The
    * winnowing guarantee: two documents sharing any run of at least
    * w + k − 1 tokens share at least one fingerprint, while the
    * selected set is ~2/(w+1) of all shingles — the density/recall
    * trade a full-doc rolling hash (TextOps.fingerprint) cannot make.
    * Documents with fewer than w shingles contribute their single
    * global min (the standard short-document degenerate case); empty
    * or null text contributes nothing.
    *
    * MAP-ONLY: one codegen'd shingle-hash pass per doc plus HOF
    * window minima (O(shingles·w) per doc, w small); no shuffle — the
    * output (id, fingerprint) relation is the joinable/indexable
    * artifact, and feeding it to [[DedupOps.sourceOverlapByKey]] or a
    * band join stays the consumer's choice. */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         shingleK: Int = 3, window: Int = 4): DataFrame = {
    require(window >= 1, s"winnow window must be >= 1, got $window")
    val hs = coalesce(
      graft.functions.TokenShingleHash.shingleHashes(col(textCol), shingleK),
      array().cast("array<bigint>"))
    val fps = when(size(hs) === 0, array().cast("array<bigint>"))
      .when(size(hs) < window, array(array_min(hs)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(hs) - lit(window)),
        i => array_min(slice(hs, i + 1, lit(window))))))
    df.select(col(idCol), explode(fps).as("fingerprint"))
  }

  /** Cross-document repeated-span masking — the exact substring-level
    * dedup pass (Lee et al., arXiv:2107.06499, "Deduplicating Training
    * Data Makes Language Models Better", word-k-gram variant): any
    * k-token span whose occurrence count across the corpus reaches
    * `minFreq` is a repeated span, and every token covered by at least
    * one such span is replaced with `marker`. Returns
    * (id, n_tokens, n_masked, masked_text); token arithmetic follows
    * `split(text, ' ')` exactly (empty text is one empty token), so
    * masked_text round-trips through the same tokenizer.
    *
    * Scale shape — everything is linear in corpus tokens, no
    * quadratic anywhere:
    *  1. ONE codegen'd pass per doc for positional span hashes
    *     (TokenShingleHash; no span strings materialized), its narrow
    *     (id, start, hash) rows localCheckpointed so both consumers —
    *     the corpus span-count aggregate and the hot-start join — read
    *     the checkpoint instead of re-running the kernel over the
    *     corpus text (the CorpusFilter gate discipline; the trade is
    *     ~16 bytes/token of executor-local blocks vs a second full
    *     text pass, and the blocks free when the plan is GC'd);
    *  2. hot-span starts come from an equi-join of span rows against
    *     the (usually tiny) hot-hash set — AQE broadcasts it when
    *     small;
    *  3. docs with NO hot span — the overwhelming majority of a real
    *     corpus — take a map-only bypass (anti-join on the touched-key
    *     column of the hot starts, WITHOUT a prior distinct: semi/anti
    *     hash builds dedupe keys themselves, and the separate distinct
    *     was a whole extra exchange — measured 1.10 s → 0.78 s on the
    *     sf0.1 bench row when removed, identical scale shape since the
    *     duplicate-id shuffle happens exactly once either way);
    *  4. only touched docs pay the token-level work: hot starts expand
    *     to ≤ k·starts covered positions (distinct), token rows
    *     left-join them on (id, pos), and one groupBy reassembles the
    *     masked text in position order. Both token-level shuffles are
    *     proportional to TOUCHED docs' tokens, not the corpus. */
  def maskRepeatedSpans(df: DataFrame, textCol: String, idCol: String,
                        k: Int, minFreq: Long,
                        marker: String = "<DUP>"): DataFrame = {
    require(k >= 2, s"span length must be >= 2 tokens, got $k")
    require(minFreq >= 2, s"minFreq must be >= 2 (1 would mask everything), got $minFreq")
    val clash = df.columns.filter(_.startsWith("__ms_"))
    require(clash.isEmpty, s"input already has reserved columns: ${clash.toSet}")
    val sh = Checkpoints.sever(df.select(col(idCol),
      posexplode(graft.functions.TokenShingleHash.shingleHashes(col(textCol), k))
        .as(Seq("__ms_start", "__ms_sh"))))
    val hot = sh.groupBy(col("__ms_sh"))
      .agg(count(lit(1)).as("__ms_n"))
      .filter(col("__ms_n") >= minFreq)
      .select(col("__ms_sh"))
    val hotStarts = sh.join(hot, Seq("__ms_sh"))
      .select(col(idCol), col("__ms_start"))
    val touchedKeys = hotStarts.select(col(idCol))
    val untouched = df.join(touchedKeys, Seq(idCol), "left_anti")
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        lit(0L).as("n_masked"),
        col(textCol).as("masked_text"))
    val covered = hotStarts.select(col(idCol),
        explode(sequence(col("__ms_start"), col("__ms_start") + lit(k - 1)))
          .as("__ms_pos"))
      .distinct()
    val tokRows = df.join(touchedKeys, Seq(idCol), "left_semi")
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__ms_pos", "__ms_tok")))
    val masked = tokRows
      .join(covered.withColumn("__ms_hit", lit(true)),
        Seq(idCol, "__ms_pos"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__ms_hit"), 1L).otherwise(0L)).as("n_masked"),
        array_join(transform(
          array_sort(collect_list(struct(col("__ms_pos").as("p"),
            when(col("__ms_hit"), marker).otherwise(col("__ms_tok")).as("t")))),
          s => s.getField("t")), " ").as("masked_text"))
    untouched.unionByName(
      masked.select(col(idCol), col("n_tokens"), col("n_masked"),
        col("masked_text")))
  }

  /** PII redaction: replace email-shaped and long-digit-run tokens with
    * placeholder tags. Deliberately simple character classes — the same
    * pattern semantics in Java regex (Spark) and RE2 (DuckDB), so the
    * operator carries an exact oracle; a production system would swap in
    * its own pattern pack at this seam. Map-only. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRunPattern = "[0-9]{7,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      DigitRunPattern, "<NUMBER>")

  // ---- BPE tokenizer training -------------------------------------------

  /** Word vocabulary with frequencies — the relation ALL tokenizer
    * training runs on. This is the standard BPE economy: pair
    * statistics are computed over |V| distinct words weighted by
    * frequency, never over the raw corpus, so one corpus-sized shuffle
    * (partial-aggregated — stopwords combine map-side) buys every
    * subsequent merge round. Words shorter than 2 chars carry no pairs
    * and are dropped. */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    wordVocab(df, textCol, minLen = 2)

  private def wordVocab(df: DataFrame, textCol: String,
                        minLen: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= minLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Corpus-weighted adjacent-symbol pair counts at the character
    * level — one BPE round's statistics (no end-of-word marker; the
    * merge TRAINER documents the same choice). Pair expansion is a
    * posexplode over the vocabulary only: ≤ len(word)−1 rows per
    * DISTINCT word, so the second shuffle is vocabulary-sized too. */
  def bpePairCounts(df: DataFrame, textCol: String,
                    minCount: Long): DataFrame =
    wordVocab(df, textCol)
      .select(col("freq"), col("word"),
        posexplode(sequence(lit(1), length(col("word")) - 1)))
      .select(col("freq"),
        col("word").substr(col("col"), lit(1)).as("left_sym"),
        col("word").substr(col("col") + 1, lit(1)).as("right_sym"))
      .groupBy(col("left_sym"), col("right_sym"))
      .agg(sum(col("freq")).as("n_pair"))
      .filter(col("n_pair") >= minCount)

  /** BPE merge trainer (Sennrich et al. 2016, arXiv:1508.07909):
    * `nMerges` rounds of (count pairs over the symbolized vocabulary →
    * pick the top pair → greedily merge its left-to-right
    * non-overlapping occurrences in every word). Returns the merge
    * table (rank, left, right, n_pair) — the artifact a tokenizer
    * ships. Character-level symbols; `endOfWord = true` appends the
    * Sennrich [[EowMarker]] as one extra initial symbol per word (and
    * admits 1-char words into the vocabulary, since the marker gives
    * them a pair), which closes the gap to the paper's algorithm
    * exactly. The default omits the marker (documented
    * simplification; it is one extra initial symbol, not a different
    * algorithm). The marker string can in principle collide with a
    * merge of the literal characters `<`,`/`,`w`,`>` — the same
    * property the paper's implementation has; corpora containing that
    * sequence as a word should pick a different marker.
    *
    * Ties break deterministically by (count DESC, left, right). Each
    * round is two vocabulary-sized jobs (pair aggregate → 1-row
    * collect, the k-means-round precedent) plus a map-only fold that
    * rewrites symbol arrays; the corpus is touched exactly once, by
    * [[wordVocab]]. The per-round driver state is ONE pair. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               endOfWord: Boolean = false): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 1000,
      s"nMerges out of range 1..1000: $nMerges")
    // split at positions that are neither start nor end: "(?!^)" alone
    // also matches the zero-width position at END of string under
    // Spark's limit=-1 split, appending a trailing "" symbol whose
    // (lastChar, "") pairs can outnumber every real pair (caught by
    // BpeSoakMain: 2M base-26 words elected '0'+'' as merge 1)
    val chars = split(col("word"), "(?!^)(?!$)")
    val syms = if (endOfWord) concat(chars, array(lit(EowMarker))) else chars
    var vocab = wordVocab(df, textCol, minLen = if (endOfWord) 1 else 2)
      .select(col("freq"), syms.as("syms"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (rank <- 1 to nMerges) {
        val top = vocab
          .select(col("freq"), col("syms"), posexplode(slice(col("syms"),
            lit(1), greatest(size(col("syms")) - 1, lit(0)))))
          .select(col("freq"), col("col").as("left_sym"),
            element_at(col("syms"), col("pos") + 2).as("right_sym"))
          .groupBy(col("left_sym"), col("right_sym"))
          .agg(sum(col("freq")).as("n_pair"))
          .orderBy(col("n_pair").desc, col("left_sym"), col("right_sym"))
          .head(1)
        if (top.isEmpty) return merges.toSeq
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, n))
        // greedy left-to-right non-overlapping merge: fold each word's
        // symbol array through (out, pending); "" is the no-pending
        // sentinel (a symbol is never empty by construction)
        val folded = aggregate(
          col("syms"),
          struct(array().cast("array<string>").as("out"),
            lit("").as("pending")),
          (acc, s) => {
            val out = acc.getField("out"); val p = acc.getField("pending")
            when(p === lit(l) && s === lit(r),
              struct(concat(out, array(lit(l + r))).as("out"),
                lit("").as("pending")))
              .when(p === lit(""),
                struct(out.as("out"), s.as("pending")))
              .otherwise(
                struct(concat(out, array(p)).as("out"), s.as("pending")))
          },
          acc => when(acc.getField("pending") === lit(""),
            acc.getField("out"))
            .otherwise(concat(acc.getField("out"),
              array(acc.getField("pending")))))
        val next = vocab.select(col("freq"), folded.as("syms")).cache()
        next.count() // materialize before unpersisting the parent
        vocab.unpersist()
        vocab = next
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** Sennrich end-of-word marker symbol (arXiv:1508.07909 §3.2),
    * appended per word when `endOfWord = true` in [[bpeTrain]] /
    * [[bpeEncode]]. */
  val EowMarker: String = "</w>"

  /** Greedy left-to-right non-overlapping replacement of one merge pair
    * — the JVM twin of the trainer's HOF fold, shared by [[bpeEncode]]. */
  private[pipeline] def mergeSymbols(syms: List[String], l: String,
                                     r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (l + r) :: mergeSymbols(rest, l, r)
    case a :: rest => a :: mergeSymbols(rest, l, r)
    case Nil => Nil
  }

  /** Encode with a TRAINED tokenizer: apply a [[bpeTrain]] merge table
    * in rank order to every word and return per-doc BPE token counts —
    * the token counter data mixtures should actually budget with (the
    * whitespace and regex counters over-count exactly the frequent
    * words BPE compresses). The merge table is the tokenizer artifact
    * (≤ thousands of rows), driver-side by construction; it ships to
    * executors in the closure and encoding is MAP-ONLY — no join, no
    * shuffle, no state. Words never seen in training still encode
    * (char-per-symbol, merges simply don't fire), so the operator is
    * total; null text encodes to 0 tokens. `endOfWord` must match the
    * trainer's setting — with it on, each word carries the
    * [[EowMarker]] symbol, which counts as a symbol unless a trained
    * merge absorbs it (the trainer's own symbol model).
    *
    * LOUD id contract: `idCol` must already be an integral column —
    * the typed row requires a long, and a silent cast would quietly
    * truncate decimals or null-out strings. Hash or cast non-integral
    * ids explicitly upstream (e.g. `xxhash64`, the hash-based
    * samplers' discipline).
    *
    * A DuckDB oracle IS possible when the merge table is pinned — the
    * registry's `q_bpe_encode` carries one (greedy fold ≡ non-
    * overlapping left-to-right string replace over a delimiter-framed
    * symbol string); with a DATA-DEPENDENT trained table the contract
    * is spec-pinned against the same independent JVM reference as the
    * trainer. */
  def bpeEncode(df: DataFrame, textCol: String, idCol: String,
                merges: Seq[(Int, String, String, Long)],
                endOfWord: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    require(Seq[DataType](LongType, IntegerType, ShortType, ByteType)
        .contains(idType),
      s"bpeEncode requires an integral id column; '$idCol' is " +
        s"${idType.simpleString} — hash or cast ids explicitly upstream")
    val ms = merges.sortBy(_._1).map(m => (m._2, m._3)).toArray
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        var n = 0L
        if (text != null) text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
          var syms = w.map(_.toString).toList
          if (endOfWord) syms = syms :+ EowMarker
          ms.foreach { case (l, r) => syms = mergeSymbols(syms, l, r) }
          n += syms.length
        }
        (id, n)
      }
      .toDF(idCol, "n_bpe_tokens")
  }

  // ---- stored BPE tokenizer model -----------------------------------------
  //
  // The PERSISTED tokenizer — the daily model artifact a training
  // pipeline versions (every token-budget counter, packing pass, and
  // mixture weight downstream must use the SAME merges yesterday's
  // runs used, or counts drift silently). The kmeans-model lifecycle
  // class, not the appendable-index class: merges are ORDER-DEPENDENT
  // (rank k's statistics condition on ranks 1..k−1), so there is no
  // meaningful append — the maintenance move is a full RETRAIN
  // committed as a new epoch behind the meta swap, readers racing it
  // resolving the old epoch until the swap lands, one superseded
  // generation kept for in-flight-encode grace.

  private[graft] final case class BpeModelMeta(
      nMerges: Int, endOfWord: Boolean, epoch: Long)

  private def bpeEpochDir(path: String, epoch: Long): String =
    s"$path/merges/e$epoch"

  private def swapBpeMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String, meta: BpeModelMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "bpe model",
      Seq((meta.nMerges.toLong, meta.endOfWord, meta.epoch))
        .toDF("n_merges", "end_of_word", "epoch"))
  }

  private[graft] def readBpeModelMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModelMeta = {
    val r = MetaIO.readMetaRow(spark, path, "bpe model", "model")
    BpeModelMeta(r.getAs[Long]("n_merges").toInt,
      r.getAs[Boolean]("end_of_word"), r.getAs[Long]("epoch"))
  }

  private def validateMerges(
      merges: Seq[(Int, String, String, Long)]): Unit = {
    require(merges.nonEmpty, "bpe model: empty merge list")
    val ranks = merges.map(_._1).sorted
    require(ranks == (1 to merges.size),
      s"bpe model: ranks must be contiguous 1..${merges.size}, got " +
        s"${ranks.take(12).mkString(",")}…")
    merges.foreach { case (rank, l, r, _) =>
      require(l.nonEmpty && r.nonEmpty,
        s"bpe model: merge $rank has an empty symbol ('$l', '$r')")
    }
  }

  private def commitBpeEpoch(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             merges: Seq[(Int, String, String, Long)],
                             meta: BpeModelMeta): Unit = {
    import spark.implicits._
    merges.toDF("rank", "left_sym", "right_sym", "n_pair")
      .coalesce(1).write.mode("overwrite")
      .parquet(bpeEpochDir(path, meta.epoch))
    swapBpeMeta(spark, path, meta)
  }

  /** Persist a trained merge table as the model artifact — validates
    * the shape ONCE at write time (contiguous ranks, non-empty
    * symbols) so every later load can trust the meta pin. `endOfWord`
    * is part of the MODEL (train and encode must agree on it), which
    * is exactly why it lives in meta and not at the encode call. */
  def writeBpeModel(spark: org.apache.spark.sql.SparkSession,
                    merges: Seq[(Int, String, String, Long)], path: String,
                    endOfWord: Boolean = false): Unit = {
    validateMerges(merges)
    commitBpeEpoch(spark, path, merges,
      BpeModelMeta(merges.size, endOfWord, epoch = 0L))
  }

  /** Load the stored merge table, rank-sorted, validating the stored
    * rows against the meta pin — a truncated or foreign relation fails
    * LOUDLY rather than silently tokenizing with half a tokenizer. */
  def readBpeModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): Seq[(Int, String, String, Long)] = {
    val meta = readBpeModelMeta(spark, path)
    val rows = spark.read.parquet(bpeEpochDir(path, meta.epoch))
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("n_pair")))
      .sortBy(_._1).toSeq
    require(rows.size == meta.nMerges,
      s"bpe model at $path: epoch ${meta.epoch} holds ${rows.size} " +
        s"merges but meta pins ${meta.nMerges} — incomplete or foreign")
    validateMerges(rows)
    rows
  }

  /** The daily serving pass: per-doc token counts against the STORED
    * tokenizer — output ≡ [[bpeEncode]] with the model's merges and
    * end-of-word convention, with no training scan anywhere. */
  def bpeEncodeStored(spark: org.apache.spark.sql.SparkSession,
                      path: String, df: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val meta = readBpeModelMeta(spark, path)
    bpeEncode(df, textCol, idCol, readBpeModel(spark, path),
      meta.endOfWord)
  }

  /** Retrain on a fresh corpus and commit as a NEW epoch — merges are
    * order-dependent, so the maintenance move is a full retrain, never
    * an append; readers racing the retrain resolve the old epoch until
    * the meta swap lands, and the superseded generation survives one
    * commit for in-flight-encode grace (the kmeans-refit janitor). */
  def retrainBpeModel(spark: org.apache.spark.sql.SparkSession,
                      path: String, train: DataFrame, textCol: String,
                      nMerges: Int): Unit = {
    val meta = readBpeModelMeta(spark, path)
    val merges = bpeTrain(train, textCol, nMerges, meta.endOfWord)
    require(merges.nonEmpty,
      "bpe retrain produced no merges (corpus has no repeated pair) — " +
        "keeping the stored model")
    commitBpeEpoch(spark, path, merges,
      BpeModelMeta(merges.size, meta.endOfWord, meta.epoch + 1))
    MetaIO.pruneEpochs(spark, Seq(s"$path/merges"),
      superseded = meta.epoch)
  }

  // ---- DuckDB oracle fragments ------------------------------------------

  def tokensSql(expr: String): String = s"string_split($expr, ' ')"

  def langScoreSql(expr: String, profile: Seq[String]): String = {
    val inList = profile.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(${tokensSql(expr)}, t -> t IN ($inList)))"
  }

  def fingerprintSql(expr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(${tokensSql(expr)}, " +
      s"t -> ${HashFns.hash32Sql("t")})), (acc, x) -> (acc * 31 + x) % 1000000007)"

  def normalizeTextSql(expr: String): String =
    s"trim(regexp_replace(lower($expr), '[^a-z0-9]+', ' ', 'g'))"

  def shinglesSql(expr: String, k: Int): String = {
    val toks = tokensSql(expr)
    s"CASE WHEN len($toks) < $k THEN [] " +
      s"ELSE list_transform(range(1, len($toks) - $k + 2), " +
      s"i -> array_to_string($toks[i:i+${k - 1}], ' ')) END"
  }
}
