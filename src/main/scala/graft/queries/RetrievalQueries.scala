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
  )

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
    TextQueries.cachedArtifactDir("rt_idx_v1", sfDir,
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
}
