package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.FleetOps

/** Fleet-observability registry row — the managed-artifact dashboard
  * ([[graft.pipeline.FleetOps]]) over six of the build-once cached
  * lifecycles (the stored exact-digest index, the stored retrieval
  * index, the host graph, the BPE tokenizer, the NB quality model,
  * and the count-min frequency sketch). The index artifacts are built
  * write→append(→compact) and the
  * models write-once, so every meta value the dashboard reports is
  * DERIVABLE: the window pointers from the lifecycle's step count,
  * the counters from the documents table — which is exactly what the
  * oracle recomputes. The on-disk
  * layout tallies ([[FleetOps.artifactLayout]]) are file-layout facts
  * with no SQL derivation; FleetOpsSpec pins those. */
object FleetQueries {

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q_fleet_health", fleetHealthQ, Some(fleetHealthSql)),
  )

  def fleetHealthQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    FleetOps.artifactMeta(spark, Seq(
      "digest_index" -> TextQueries.storedDigestIdxDir(spark, sfDir, d),
      "retrieval_index" ->
        RetrievalQueries.storedRetrievalIdxDir(spark, sfDir, d),
      "host_graph" -> GraphQueries.storedHostGraphDir(spark, sfDir, d),
      "bpe_model" -> TextQueries.storedBpeDir(spark, sfDir),
      "nb_model" -> TextQueries.storedNbDir(spark, sfDir, d),
      "cms_index" -> TextQueries.storedCmsDir(spark, sfDir, d)))
  }

  /** Every meta value, recomputed: the pointers from the
    * write(e0)→append(e1)→compact(e2, re-based) lifecycle both cached
    * artifacts share, the counters from the even-id corpus slice they
    * index (distinct digests for the digest index; doc/token counts
    * for the retrieval index; the block-max modulus re-picked at the
    * compaction from the even-half doc count — RetrievalOps
    * .blockCountFor verbatim; per-class doc and non-empty-token counts
    * for the NB model), the geometry from the builders' defaults. */
  def fleetHealthSql: String = {
    val toks = graft.pipeline.TextOps.tokensSql("text")
    val (cmsDepth, cmsWidth) = TextQueries.cmsFleetGeom
    s"""WITH even AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
       |), rt AS (
       |  SELECT CAST(count(*) AS VARCHAR) AS n_docs,
       |    CAST(CAST(sum(len($toks)) AS BIGINT) AS VARCHAR) AS tot
       |  FROM even
       |), nbtok AS (
       |  SELECT (lang = 'en') AS lab,
       |    CAST(len(list_filter($toks, t -> len(t) > 0)) AS BIGINT) AS nt
       |  FROM documents WHERE doc_id % 2 = 0
       |), nb AS (
       |  SELECT
       |    CAST(count(*) FILTER (lab) AS VARCHAR) AS n_pos,
       |    CAST(count(*) FILTER (NOT lab) AS VARCHAR) AS n_neg,
       |    CAST(CAST(coalesce(sum(nt) FILTER (lab), 0) AS BIGINT)
       |      AS VARCHAR) AS t_pos,
       |    CAST(CAST(coalesce(sum(nt) FILTER (NOT lab), 0) AS BIGINT)
       |      AS VARCHAR) AS t_neg
       |  FROM nbtok
       |), dg AS (
       |  SELECT CAST(count(DISTINCT md5(text)) AS VARCHAR) AS n FROM even
       |), hrows AS (
       |  SELECT 'h' || (doc_id % 199) AS src,
       |    'h' || ((doc_id * 7 + j * 13 + 1) % 199) AS dst
       |  FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
       |        FROM even)
       |  WHERE 'h' || (doc_id % 199)
       |    != 'h' || ((doc_id * 7 + j * 13 + 1) % 199)
       |), hg_tw AS (
       |  SELECT CAST(count(*) AS VARCHAR) AS v FROM hrows
       |), hg_rc AS (
       |  SELECT CAST(count(*) AS VARCHAR) AS v
       |  FROM (SELECT DISTINCT src, dst FROM hrows)
       |), cms AS (
       |  SELECT CAST(count(*) AS VARCHAR) AS v
       |  FROM (${TextQueries.cmsEvenCellsSql})
       |)
       |SELECT * FROM (VALUES
       |  ('digest_index', 'bloom_bits', '1048576'),
       |  ('digest_index', 'bloom_hashes', '4'),
       |  ('digest_index', 'epoch', '2'),
       |  ('digest_index', 'digest_count', (SELECT n FROM dg)),
       |  ('digest_index', 'digest_base', '2'),
       |  ('digest_index', 'last_batch_id', '-1'),
       |  ('retrieval_index', 'epoch', '2'),
       |  ('retrieval_index', 'base', '2'),
       |  ('retrieval_index', 'n_docs', (SELECT n_docs FROM rt)),
       |  ('retrieval_index', 'total_tokens', (SELECT tot FROM rt)),
       |  ('retrieval_index', 'last_batch_id', '-1'),
       |  ('retrieval_index', 'has_positions', 'false'),
       |  ('retrieval_index', 'has_termstats', 'true'),
       |  ('retrieval_index', 'block_count',
       |    (SELECT CAST(greatest(1, least(1048576,
       |       CAST(count(*) AS BIGINT) // 64)) AS VARCHAR) FROM even)),
       |  ('host_graph', 'epoch', '2'),
       |  ('host_graph', 'base', '2'),
       |  ('host_graph', 'row_count', (SELECT v FROM hg_rc)),
       |  ('host_graph', 'total_w', (SELECT v FROM hg_tw)),
       |  ('host_graph', 'last_batch_id', '-1'),
       |  ('nb_model', 'dim', '256'),
       |  ('nb_model', 'n_pos', (SELECT n_pos FROM nb)),
       |  ('nb_model', 'n_neg', (SELECT n_neg FROM nb)),
       |  ('nb_model', 't_pos', (SELECT t_pos FROM nb)),
       |  ('nb_model', 't_neg', (SELECT t_neg FROM nb)),
       |  ('bpe_model', 'n_merges', '8'),
       |  ('bpe_model', 'end_of_word', 'false'),
       |  ('bpe_model', 'epoch', '0'),
       |  ('cms_index', 'depth', '$cmsDepth'),
       |  ('cms_index', 'width', '$cmsWidth'),
       |  ('cms_index', 'group_cols', 'source'),
       |  ('cms_index', 'cell_rows', (SELECT v FROM cms)),
       |  ('cms_index', 'epoch', '1'),
       |  ('cms_index', 'last_batch_id', '-1')
       |) AS t(artifact, "key", "value")""".stripMargin
  }
}
