package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.RetrievalOps

/** Ranked-retrieval registry rows — BM25 top-K with the integer-exact
  * scoring variant ([[graft.pipeline.RetrievalOps]]) over the documents
  * table, one-shot and against the stored retrieval index. The query
  * WORKLOAD is derived from the corpus itself (every 25th doc's first
  * four tokens), so both the Spark plan and the DuckDB oracle rebuild
  * it from the same formulas with no side-channel fixture. */
object RetrievalQueries {

  private val BmK = 10
  private val QueryEvery = 25
  private val QueryTokens = 4

  /** The bounded serving mode's per-term posting ceiling — LOW on
    * purpose, so the truncation window is ACTIVE at every SF and the
    * oracle (which unrolls the same truncation) pins its semantics
    * bit-for-bit, not just the no-op case. The cap ≡ exact identity is
    * spec-pinned separately (RetrievalOpsSpec). */
  private val CapDf = 25

  def all: Seq[GraftQuery] = Seq(
    // one-shot ranked retrieval over the full corpus — the research
    // and forensics move ("which docs does this leaked string rank")
    GraftQuery("q_bm25_topk", bm25TopKQ, Some(bm25Sql()), bench = true),
    // the serving path: even-id docs persist once (build in two slices
    // + compact, so the row also oracle-gates appendRetrievalIndex and
    // compactRetrievalIndex), the SAME workload probes the stored
    // postings — output ≡ the one-shot scorer over the indexed half,
    // so the oracle is the same SQL with the corpus predicate applied
    GraftQuery("q_bm25_stored", bm25StoredQ,
      Some(bm25Sql(corpusWhere = "WHERE doc_id % 2 = 0")), bench = true),
    // the BOUNDED serving mode: every term's posting list truncated to
    // its CapDf highest-contribution postings (true df kept), the
    // stopword-blowup cap — oracle unrolls the same truncation window
    GraftQuery("q_bm25_capped", bm25CappedQ, Some(bm25CappedSql),
      bench = true),
    // EXACT top-K at bounded cost: max-score pruning with the low/high
    // split at the same CapDf — the oracle is the EXACT scorer's SQL,
    // because pruning is a cost move, never a semantics move
    GraftQuery("q_bm25_maxscore", bm25MaxScoreQ, Some(bm25Sql()),
      bench = true),
    // the STORED max-score probe — same exactness contract, and on a
    // block-stats artifact the fallback lane (all-common-token
    // queries, where the per-term θ test cannot prune) goes through
    // BLOCK-MAX pruning: whole doc blocks below a seeded threshold
    // drop before scoring. The oracle is STILL the exact scorer's SQL
    // over the indexed half — block-max is a cost move only
    GraftQuery("q_bm25_blockmax", bm25BlockMaxQ,
      Some(bm25Sql(corpusWhere = "WHERE doc_id % 2 = 0")), bench = true),
    // phrase forensics: BM25 restricted to docs containing the query
    // text as a CONSECUTIVE token run, occurrence counts attached
    GraftQuery("q_bm25_phrase", bm25PhraseQ, Some(bm25PhraseSql()),
      bench = true),
    // the same forensics SERVED: positional postings persisted in the
    // retrieval artifact (built in two slices + compacted, so the
    // positional append/compact paths are oracle-gated too), no
    // corpus text read at probe time
    GraftQuery("q_bm25_phrase_stored", bm25PhraseStoredQ,
      Some(bm25PhraseSql(corpusWhere = "WHERE doc_id % 2 = 0")),
      bench = true),
    // the relaxed sibling: every query term inside a 6-token window
    // in ANY order (a paraphrase reorders words; the window still
    // catches it) — windows anchored at term occurrences, matched
    // through width-W position bins, never a range join
    GraftQuery("q_bm25_proximity", bm25ProximityQ,
      Some(bm25ProximitySql()), bench = true),
    // proximity SERVED from the same positional artifact the stored
    // phrase row maintains — one more probe over an index the round
    // already oracle-gates through build/append/compact
    GraftQuery("q_bm25_proximity_stored", bm25ProximityStoredQ,
      Some(bm25ProximitySql(corpusWhere = "WHERE doc_id % 2 = 0")),
      bench = true),
  )

  private val ProxWindow = 6

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")

  /** The derived query workload: (query_id, query_text). */
  private def workload(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(col("doc_id") % QueryEvery === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.pipeline.TextOps.tokens(col("text")),
          1, QueryTokens), " ").as("query_text"))

  def bm25TopKQ(spark: SparkSession, sfDir: String): DataFrame =
    RetrievalOps.bm25TopK(docs(spark, sfDir), "text", "doc_id",
      workload(spark, sfDir), "query_id", "query_text", BmK)

  /** The stored retrieval index over the even-id half, built in two
    * slices + compacted (probe output is unchanged by construction,
    * only the file layout moves). */
  private[queries] def storedRetrievalIdxDir(spark: SparkSession, sfDir: String,
                                    d: DataFrame): String =
    TextQueries.cachedArtifactDir("rt_idx_v3", sfDir,
      d.filter(col("doc_id") % 2 === 0)) { dir =>
      RetrievalOps.writeRetrievalIndex(
        d.filter(col("doc_id") % 4 === 0), "text", "doc_id", dir)
      RetrievalOps.appendRetrievalIndex(spark, dir,
        d.filter(col("doc_id") % 4 === 2), "text", "doc_id")
      RetrievalOps.compactRetrievalIndex(spark, dir)
    }

  def bm25StoredQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    RetrievalOps.bm25AgainstStoredIndex(spark,
      storedRetrievalIdxDir(spark, sfDir, d),
      workload(spark, sfDir), "query_id", "query_text", BmK)
  }

  def bm25CappedQ(spark: SparkSession, sfDir: String): DataFrame =
    RetrievalOps.bm25TopKCapped(docs(spark, sfDir), "text", "doc_id",
      workload(spark, sfDir), "query_id", "query_text", BmK, CapDf)

  def bm25MaxScoreQ(spark: SparkSession, sfDir: String): DataFrame =
    RetrievalOps.bm25TopKMaxScore(docs(spark, sfDir), "text", "doc_id",
      workload(spark, sfDir), "query_id", "query_text", BmK, CapDf)

  def bm25BlockMaxQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    RetrievalOps.bm25AgainstStoredIndex(spark,
      storedRetrievalIdxDir(spark, sfDir, d),
      workload(spark, sfDir), "query_id", "query_text", BmK,
      maxScoreSplit = Some(CapDf))
  }

  def bm25PhraseQ(spark: SparkSession, sfDir: String): DataFrame =
    RetrievalOps.bm25PhraseTopK(docs(spark, sfDir), "text", "doc_id",
      workload(spark, sfDir), "query_id", "query_text", BmK)

  /** The POSITIONAL stored index over the even-id half — the phrase
    * twin of [[storedRetrievalIdxDir]] (separate artifact: the bag
    * index deliberately stays positions-less so the refusal path
    * stays honest). */
  private def storedPhraseIdxDir(spark: SparkSession, sfDir: String,
                                 d: DataFrame): String =
    TextQueries.cachedArtifactDir("rtp_idx_v3", sfDir,
      d.filter(col("doc_id") % 2 === 0)) { dir =>
      RetrievalOps.writeRetrievalIndex(
        d.filter(col("doc_id") % 4 === 0), "text", "doc_id", dir,
        withPositions = true)
      RetrievalOps.appendRetrievalIndex(spark, dir,
        d.filter(col("doc_id") % 4 === 2), "text", "doc_id")
      RetrievalOps.compactRetrievalIndex(spark, dir)
    }

  def bm25PhraseStoredQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    RetrievalOps.phraseAgainstStoredIndex(spark,
      storedPhraseIdxDir(spark, sfDir, d),
      workload(spark, sfDir), "query_id", "query_text", BmK)
  }

  def bm25ProximityQ(spark: SparkSession, sfDir: String): DataFrame =
    RetrievalOps.bm25ProximityTopK(docs(spark, sfDir), "text", "doc_id",
      workload(spark, sfDir), "query_id", "query_text", BmK, ProxWindow)

  def bm25ProximityStoredQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    RetrievalOps.proximityAgainstStoredIndex(spark,
      storedPhraseIdxDir(spark, sfDir, d),
      workload(spark, sfDir), "query_id", "query_text", BmK, ProxWindow)
  }

  /** The scoring CTE chain of the integer-exact BM25 oracle — the
    * Spark formulas verbatim in DuckDB arithmetic (`//` floor division
    * ≡ Spark `div` on the all-non-negative operands here; sums cast
    * back to BIGINT because DuckDB widens sum(BIGINT) to HUGEINT).
    * Expects prior CTEs `tok(doc_id, token)` (one row per corpus token
    * OCCURRENCE) and `q(query_id, query_text)` — written once, shared
    * by every substrate (the documents table here, the anchor-text
    * relation in GraphQueries). Callers append the final rank-cutoff
    * SELECT. */
  private[queries] def bm25CtesFromTok: String =
    s"""post AS (
       |  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n,
       |    (1000 * CAST(sum(dl) AS BIGINT)) // count(*) AS avgdl_milli
       |  FROM dl
       |), dfreq AS (
       |  SELECT token, count(*) AS df FROM post GROUP BY 1
       |), qt AS (
       |  SELECT DISTINCT query_id, token FROM (
       |    SELECT query_id,
       |      unnest(${graft.pipeline.TextOps.tokensSql("query_text")})
       |        AS token
       |    FROM q)
       |), contrib AS (
       |  SELECT qt.query_id, post.doc_id,
       |    (least((1000000 * (2 * (s.n - dfreq.df) + 1))
       |        // (2 * dfreq.df + 1), ${RetrievalOps.IdfCapMicro})
       |      * ((22000000 * post.tf)
       |        // (10 * post.tf + 3 + (9000 * dl.dl) // s.avgdl_milli)))
       |      // 1000000 AS c
       |  FROM qt
       |  JOIN post USING (token)
       |  JOIN dfreq USING (token)
       |  JOIN dl ON post.doc_id = dl.doc_id
       |  CROSS JOIN stats s
       |), scored AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_micro DESC, doc_id) AS rnk
       |  FROM scored
       |)""".stripMargin

  private def bm25Sql(corpusWhere: String = ""): String = {
    val toks = graft.pipeline.TextOps.tokensSql("text")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents $corpusWhere
       |), tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM corpus
       |), q AS (
       |  SELECT doc_id AS query_id,
       |    array_to_string(($toks)[1:$QueryTokens], ' ') AS query_text
       |  FROM documents WHERE doc_id % $QueryEvery = 0
       |), $bm25CtesFromTok
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", doc_id, score_micro
       |FROM ranked WHERE rnk <= $BmK""".stripMargin
  }

  /** The BOUNDED serving mode's oracle — the exact-scorer CTEs with the
    * truncation window unrolled verbatim: rank every token's postings
    * by the tf saturation term (DESC, doc_id ties), keep rank ≤ CapDf,
    * score the kept postings with the TRUE pre-truncation df. Ranking
    * all tokens (not just query terms) is equivalent: the per-token
    * window never looks across tokens, and non-query tokens die at the
    * qt join either way. */
  private def bm25CappedSql: String = {
    val toks = graft.pipeline.TextOps.tokensSql("text")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM corpus
       |), q AS (
       |  SELECT doc_id AS query_id,
       |    array_to_string(($toks)[1:$QueryTokens], ' ') AS query_text
       |  FROM documents WHERE doc_id % $QueryEvery = 0
       |), post AS (
       |  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n,
       |    (1000 * CAST(sum(dl) AS BIGINT)) // count(*) AS avgdl_milli
       |  FROM dl
       |), dfreq AS (
       |  SELECT token, count(*) AS df FROM post GROUP BY 1
       |), qt AS (
       |  SELECT DISTINCT query_id, token FROM (
       |    SELECT query_id,
       |      unnest(${graft.pipeline.TextOps.tokensSql("query_text")})
       |        AS token
       |    FROM q)
       |), tfm AS (
       |  SELECT post.token, post.doc_id, post.tf, dl.dl,
       |    (22000000 * post.tf)
       |      // (10 * post.tf + 3 + (9000 * dl.dl) // s.avgdl_milli) AS tfm
       |  FROM post JOIN dl ON post.doc_id = dl.doc_id
       |  CROSS JOIN stats s
       |), kept AS (
       |  SELECT token, doc_id, tf, dl FROM (
       |    SELECT token, doc_id, tf, dl,
       |      row_number() OVER (PARTITION BY token
       |                         ORDER BY tfm DESC, doc_id) AS prn
       |    FROM tfm) WHERE prn <= $CapDf
       |), contrib AS (
       |  SELECT qt.query_id, kept.doc_id,
       |    (least((1000000 * (2 * (s.n - dfreq.df) + 1))
       |        // (2 * dfreq.df + 1), ${RetrievalOps.IdfCapMicro})
       |      * ((22000000 * kept.tf)
       |        // (10 * kept.tf + 3 + (9000 * kept.dl) // s.avgdl_milli)))
       |      // 1000000 AS c
       |  FROM qt
       |  JOIN kept USING (token)
       |  JOIN dfreq USING (token)
       |  CROSS JOIN stats s
       |), scored AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_micro DESC, doc_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", doc_id, score_micro
       |FROM ranked WHERE rnk <= $BmK""".stripMargin
  }

  /** The proximity oracle: positions rebuilt by list index, anchors =
    * term occurrences, a plain range predicate per anchor (DuckDB
    * handles the non-equi join natively — the Spark side's bin trick
    * is a cost move with identical semantics), count-distinct-terms
    * per window, then the shared scorer restricted to matching docs. */
  private def bm25ProximitySql(corpusWhere: String = ""): String = {
    val toks = graft.pipeline.TextOps.tokensSql("text")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents $corpusWhere
       |), tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM corpus
       |), q AS (
       |  SELECT doc_id AS query_id,
       |    array_to_string(($toks)[1:$QueryTokens], ' ') AS query_text
       |  FROM documents WHERE doc_id % $QueryEvery = 0
       |), $bm25CtesFromTok, tarr AS (
       |  SELECT doc_id, $toks AS toks FROM corpus
       |), ptok AS (
       |  SELECT doc_id, pos, toks[pos] AS token FROM (
       |    SELECT doc_id, toks,
       |      unnest(range(1, len(toks) + 1)) AS pos
       |    FROM tarr)
       |), anch AS (
       |  SELECT DISTINCT qt.query_id, pp.doc_id, pp.pos AS o
       |  FROM qt JOIN ptok pp USING (token)
       |), mem AS (
       |  SELECT qt.query_id, pp.doc_id, pp.token, pp.pos
       |  FROM qt JOIN ptok pp USING (token)
       |), wnd AS (
       |  SELECT a.query_id, a.doc_id, a.o,
       |    count(DISTINCT m.token) AS nt
       |  FROM anch a JOIN mem m
       |    ON m.query_id = a.query_id AND m.doc_id = a.doc_id
       |   AND m.pos >= a.o AND m.pos <= a.o + $ProxWindow - 1
       |  GROUP BY 1, 2, 3
       |), qm AS (
       |  SELECT query_id, count(*) AS mm FROM qt GROUP BY 1
       |), prox AS (
       |  SELECT w.query_id, w.doc_id, CAST(count(*) AS BIGINT) AS n_windows
       |  FROM wnd w JOIN qm USING (query_id)
       |  WHERE w.nt = qm.mm GROUP BY 1, 2
       |), pranked AS (
       |  SELECT s.query_id, s.doc_id, s.score_micro, prox.n_windows,
       |    row_number() OVER (PARTITION BY s.query_id
       |                       ORDER BY s.score_micro DESC, s.doc_id) AS rnk
       |  FROM scored s
       |  JOIN prox ON s.query_id = prox.query_id AND s.doc_id = prox.doc_id
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", doc_id,
       |  score_micro, n_windows
       |FROM pranked WHERE rnk <= $BmK""".stripMargin
  }

  /** The phrase-retrieval oracle: positions rebuilt by list index, a
    * phrase-start vote per (phrase slot × matching position), an
    * occurrence where all m slots voted, and the shared exact-scorer
    * CTEs restricted to occurring docs (rank AFTER the restriction —
    * the `ranked` CTE of the shared chain goes unused here). */
  private def bm25PhraseSql(corpusWhere: String = ""): String = {
    val toks = graft.pipeline.TextOps.tokensSql("text")
    val qtoks = graft.pipeline.TextOps.tokensSql("query_text")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents $corpusWhere
       |), tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM corpus
       |), q AS (
       |  SELECT doc_id AS query_id,
       |    array_to_string(($toks)[1:$QueryTokens], ' ') AS query_text
       |  FROM documents WHERE doc_id % $QueryEvery = 0
       |), $bm25CtesFromTok, tarr AS (
       |  SELECT doc_id, $toks AS toks FROM corpus
       |), ptok AS (
       |  SELECT doc_id, pos, toks[pos] AS token FROM (
       |    SELECT doc_id, toks,
       |      unnest(range(1, len(toks) + 1)) AS pos
       |    FROM tarr)
       |), qarr AS (
       |  SELECT query_id, $qtoks AS qtoks FROM q
       |), pterm AS (
       |  SELECT query_id, i, qtoks[i] AS token, len(qtoks) AS m FROM (
       |    SELECT query_id, qtoks,
       |      unnest(range(1, len(qtoks) + 1)) AS i
       |    FROM qarr)
       |), votes AS (
       |  SELECT p.query_id, pp.doc_id, pp.pos - p.i + 1 AS start_pos, p.m
       |  FROM pterm p JOIN ptok pp USING (token)
       |  WHERE pp.pos - p.i + 1 >= 1
       |), occ AS (
       |  SELECT query_id, doc_id, start_pos, m, count(*) AS nm
       |  FROM votes GROUP BY 1, 2, 3, 4
       |), pm AS (
       |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
       |  FROM occ WHERE nm = m GROUP BY 1, 2
       |), pranked AS (
       |  SELECT s.query_id, s.doc_id, s.score_micro, pm.n_occurrences,
       |    row_number() OVER (PARTITION BY s.query_id
       |                       ORDER BY s.score_micro DESC, s.doc_id) AS rnk
       |  FROM scored s
       |  JOIN pm ON s.query_id = pm.query_id AND s.doc_id = pm.doc_id
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", doc_id,
       |  score_micro, n_occurrences
       |FROM pranked WHERE rnk <= $BmK""".stripMargin
  }
}
