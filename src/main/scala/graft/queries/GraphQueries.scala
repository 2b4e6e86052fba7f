package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{LinkGraphOps, WarcOps}

/** Crawl-graph registry rows — out-link mining over the linked
  * synthetic crawl ([[WarcOps.encodeSyntheticWarcGzLinked]]) and
  * integer-exact host PageRank ([[LinkGraphOps]]).
  *
  * Two substrates, deliberately: the LINK rows run the real container
  * front door (gz member walk → page filter → tag extraction) over the
  * fixed-size formula crawl, so their oracles rebuild the reference
  * graph from the generator formulas; the PAGERANK row runs on a
  * corpus-SCALED host graph derived from the documents table (edge
  * count grows with SF, host set fixed at a prime 199), so the bench
  * gate watches the shape that matters at 100 TB — one corpus-sized
  * rollup, then host-sized iterations. */
object GraphQueries {

  private val PrHosts = 199L
  private val PrIters = 5

  def all: Seq[GraftQuery] = Seq(
    // extraction verbatim: every out-link row incl. positional anchor
    GraftQuery("q_link_edges", linkEdgesQ, Some(linkEdgesSql)),
    // the host graph: cross-host rollup with intra-host edges dropped
    GraftQuery("q_link_hostgraph", linkHostGraphQ, Some(linkHostGraphSql)),
    // authority scores: K synchronous integer-exact PageRank steps
    GraftQuery("q_pagerank_hosts", pageRankHostsQ, Some(pageRankSql()),
      bench = true),
    // the COMPLETED recurrence: dangling-mass redistribution (run on
    // an edge substrate with guaranteed dangling hosts — sources drawn
    // from a 97-host subset, destinations from all 199, so the
    // redistribution term is live at every SF); the oracle unrolls the
    // redistributed steps verbatim
    GraftQuery("q_pagerank_full", pageRankFullQ, Some(pageRankFullSql),
      bench = true),
    // the serving path: the STORED host graph (fourteenth lifecycle)
    // built in two slices via the segment ledger — including a
    // re-dropped segment (no-op) — then compacted; ranks off the store
    // ≡ the one-shot scorer over the union, so the oracle is the same
    // unrolled SQL with the corpus predicate applied
    GraftQuery("q_pagerank_stored", pageRankStoredQ,
      Some(pageRankSql(corpusWhere = "WHERE doc_id % 2 = 0")),
      bench = true),
    // frontier prioritization: every 200-page joined to its host's
    // authority from the crawl's own graph — the recrawl scheduler's
    // sort key, end to end through the real container
    GraftQuery("q_rank_frontier", rankFrontierQ, Some(rankFrontierSql),
      bench = true),
    // anchor-text retrieval: targets ranked by what OTHER pages' link
    // anchors say about them — the classic web-search signal, the
    // graph family composed with the BM25 scorer
    GraftQuery("q_bm25_anchors", bm25AnchorsQ, Some(bm25AnchorsSql),
      bench = true),
  )

  /** The linked crawl walked back to (page_uri, html) — status-200
    * text pages of the formula corpus. */
  private def crawlPages(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 40).as("warc_key")).distinct()
    val recs = WarcOps.warcRecordsGz(
      WarcOps.encodeSyntheticWarcGzLinked(keys, "warc_key"),
      "content", "media_id")
    recs.filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("target_uri").as("page_uri"), col("body").as("html"))
  }

  def linkEdgesQ(spark: SparkSession, sfDir: String): DataFrame =
    LinkGraphOps.extractLinks(crawlPages(spark, sfDir), "page_uri", "html")

  /** Every `<a href>` of every 200-page, rebuilt from the generator
    * formulas — URI, target, and anchor text verbatim. */
  def linkEdgesSql: String =
    """WITH ids AS (
      |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
      |), resp AS (
      |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
      |), pg AS (
      |  SELECT wid, r FROM resp WHERE (wid + r) % 5 != 0
      |), lnk AS (
      |  SELECT wid, r, unnest(range(0, 1 + (wid + r) % 3)) AS j FROM pg
      |), tgt AS (
      |  SELECT wid, r, j,
      |    (wid * 5 + r * 3 + j * 11) % 40 AS tid,
      |    (wid + 2 * r + j) % 4 AS tr
      |  FROM lnk
      |)
      |SELECT
      |  'http://h' || (wid % 7) || '.test/' || wid || '/' || r AS src_uri,
      |  'http://h' || (tid % 7) || '.test/' || tid || '/' || tr AS dst_uri,
      |  'a' || wid || '_' || r || '_' || j
      |    || ' topic' || ((wid + r + 2 * j) % 5) AS anchor_text
      |FROM tgt""".stripMargin

  def linkHostGraphQ(spark: SparkSession, sfDir: String): DataFrame =
    LinkGraphOps.hostGraph(
      LinkGraphOps.extractLinks(crawlPages(spark, sfDir), "page_uri", "html"),
      "src_uri", "dst_uri")

  def linkHostGraphSql: String =
    """WITH ids AS (
      |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
      |), resp AS (
      |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
      |), pg AS (
      |  SELECT wid, r FROM resp WHERE (wid + r) % 5 != 0
      |), lnk AS (
      |  SELECT wid, r, unnest(range(0, 1 + (wid + r) % 3)) AS j FROM pg
      |), e AS (
      |  SELECT 'h' || (wid % 7) || '.test' AS src_host,
      |    'h' || (((wid * 5 + r * 3 + j * 11) % 40) % 7) || '.test' AS dst_host
      |  FROM lnk
      |  WHERE wid % 7 != ((wid * 5 + r * 3 + j * 11) % 40) % 7
      |)
      |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
      |FROM e GROUP BY 1, 2""".stripMargin

  /** The corpus-scaled synthetic host-link relation: each doc emits
    * 1 + doc_id % 3 links from host h(doc_id % 199) to host
    * h((doc_id·7 + j·13 + 1) % 199) — edge volume grows with SF, the
    * host universe stays a fixed prime so the rank relation is always
    * host-sized. */
  private def prHostEdges(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(sequence(lit(0L), col("doc_id") % 3)).as("j"))
      .select(
        concat(lit("h"), (col("doc_id") % PrHosts).cast("string"))
          .as("src_host"),
        concat(lit("h"),
          ((col("doc_id") * 7 + col("j") * 13 + 1) % PrHosts).cast("string"))
          .as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  def pageRankHostsQ(spark: SparkSession, sfDir: String): DataFrame =
    LinkGraphOps.pageRankHosts(
      prHostEdges(Tables.read(spark, sfDir, "documents")),
      "src_host", "dst_host", "n_links", PrIters)

  /** The dangling-substrate variant: sources drawn only from hosts
    * h0..h96 (doc_id % 97), destinations from all 199 — every
    * destination-only host is dangling, so the redistributed
    * recurrence differs from the mass-dropping one at every SF. */
  private def prHostEdgesDangling(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(sequence(lit(0L), col("doc_id") % 3)).as("j"))
      .select(
        concat(lit("h"), (col("doc_id") % 97).cast("string"))
          .as("src_host"),
        concat(lit("h"),
          ((col("doc_id") * 7 + col("j") * 13 + 1) % PrHosts).cast("string"))
          .as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  def pageRankFullQ(spark: SparkSession, sfDir: String): DataFrame =
    LinkGraphOps.pageRankHostsFull(
      prHostEdgesDangling(Tables.read(spark, sfDir, "documents")),
      "src_host", "dst_host", "n_links", PrIters)

  /** The stored host graph over the even-id half's edges, built in two
    * ledgered slices — slice 2 dropped TWICE (the re-drop must add
    * nothing: edge counts are value folds, the ledger is the identity)
    * — then compacted (probe output unchanged by construction, only
    * file layout and merge width move). Cached per content fingerprint
    * so the benched steady state measures the RANK SERVE, not a
    * rebuild of an immutable artifact. */
  private[queries] def storedHostGraphDir(spark: SparkSession,
                                          sfDir: String,
                                          d: DataFrame): String =
    TextQueries.cachedArtifactDir("lg_idx_v1", sfDir,
      d.filter(col("doc_id") % 2 === 0)) { dir =>
      val s0 = prHostEdges(d.filter(col("doc_id") % 4 === 0))
      val s2 = prHostEdges(d.filter(col("doc_id") % 4 === 2))
      LinkGraphOps.writeHostGraphIndex(s0, "src_host", "dst_host",
        "n_links", dir)
      require(LinkGraphOps.ingestHostGraphSegment(spark, dir, s2,
        "src_host", "dst_host", "n_links", "seg-2"))
      require(!LinkGraphOps.ingestHostGraphSegment(spark, dir, s2,
        "src_host", "dst_host", "n_links", "seg-2"),
        "re-dropped segment must be a no-op")
      LinkGraphOps.compactHostGraphIndex(spark, dir)
    }

  def pageRankStoredQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    LinkGraphOps.pageRankStoredGraph(spark,
      storedHostGraphDir(spark, sfDir, d), PrIters)
  }

  /** The PageRank recurrence unrolled to `PrIters` CTEs — every step's
    * floor divisions verbatim (`//` ≡ Spark `div` on these
    * non-negative operands; sums cast back to BIGINT because DuckDB
    * widens sum(BIGINT) to HUGEINT). Expects a prior CTE `e(src, dst,
    * w)` — the SAME unrolled steps serve every edge substrate. */
  private def prCtes: String = {
    val steps = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT n.host,
         |    CAST(150000 + (850 * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT ew.dst, CAST(sum((p.r * ew.share) // 1000000) AS BIGINT) AS s
         |    FROM ew JOIN r${i - 1} p ON ew.src = p.host GROUP BY ew.dst
         |  ) c ON c.dst = n.host
         |)""".stripMargin
    }.mkString(", ")
    s"""o AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1
       |), ew AS (
       |  SELECT e.src, e.dst, (1000000 * e.w) // o.outw AS share
       |  FROM e JOIN o USING (src)
       |), nodes AS (
       |  SELECT src AS host FROM ew UNION SELECT dst FROM ew
       |), r0 AS (
       |  SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $steps""".stripMargin
  }

  /** The REDISTRIBUTED recurrence unrolled: each step first sums the
    * dangling hosts' rank (d<i>), then every host's inflow gains
    * ⌊dm/nn⌋ before damping — the Spark loop's per-step scalars as
    * one-row CTEs. */
  private def prFullCtes: String = {
    val steps = (1 to PrIters).map { i =>
      s"""d$i AS (
         |  SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dm FROM r${i - 1}
         |  WHERE host IN (SELECT host FROM dang)
         |), r$i AS (
         |  SELECT n.host,
         |    CAST(150000 + (850 * (COALESCE(c.s, 0)
         |      + (SELECT dm // nn FROM d$i, ncnt))) // 1000 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT ew.dst, CAST(sum((p.r * ew.share) // 1000000) AS BIGINT) AS s
         |    FROM ew JOIN r${i - 1} p ON ew.src = p.host GROUP BY ew.dst
         |  ) c ON c.dst = n.host
         |)""".stripMargin
    }.mkString(", ")
    s"""o AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1
       |), ew AS (
       |  SELECT e.src, e.dst, (1000000 * e.w) // o.outw AS share
       |  FROM e JOIN o USING (src)
       |), nodes AS (
       |  SELECT src AS host FROM ew UNION SELECT dst FROM ew
       |), dang AS (
       |  SELECT host FROM nodes
       |  WHERE host NOT IN (SELECT DISTINCT src FROM ew)
       |), ncnt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes
       |), r0 AS (
       |  SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $steps""".stripMargin
  }

  def pageRankFullSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
       |  FROM documents
       |), hrows AS (
       |  SELECT 'h' || (doc_id % 97) AS src,
       |    'h' || ((doc_id * 7 + j * 13 + 1) % $PrHosts) AS dst
       |  FROM raw
       |), e AS (
       |  SELECT src, dst, count(*) AS w FROM hrows
       |  WHERE src != dst GROUP BY 1, 2
       |), $prFullCtes
       |SELECT host, r AS rank_micro FROM r$PrIters""".stripMargin

  def pageRankSql(corpusWhere: String = ""): String =
    s"""WITH raw AS (
       |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j
       |  FROM documents $corpusWhere
       |), hrows AS (
       |  SELECT 'h' || (doc_id % $PrHosts) AS src,
       |    'h' || ((doc_id * 7 + j * 13 + 1) % $PrHosts) AS dst
       |  FROM raw
       |), e AS (
       |  SELECT src, dst, count(*) AS w FROM hrows
       |  WHERE src != dst GROUP BY 1, 2
       |), $prCtes
       |SELECT host, r AS rank_micro FROM r$PrIters""".stripMargin

  /** FRONTIER PRIORITIZATION end to end: every status-200 page of the
    * crawl carries its host's authority — the relation a recrawl
    * scheduler sorts by and a quality pipeline joins as a prior.
    * Ranks come from the crawl's OWN graph (walk → extract → rollup →
    * K integer steps), pages from the same walk; one declarative plan,
    * one broadcast-sized join at the end (ranks are host-cardinality). */
  def rankFrontierQ(spark: SparkSession, sfDir: String): DataFrame = {
    val pages = crawlPages(spark, sfDir)
    val ranks = LinkGraphOps.pageRankHosts(
      LinkGraphOps.hostGraph(
        LinkGraphOps.extractLinks(pages, "page_uri", "html"),
        "src_uri", "dst_uri"),
      "src_host", "dst_host", "n_links", PrIters)
    pages.select(col("page_uri"),
        LinkGraphOps.hostOf(col("page_uri")).as("host"))
      .join(ranks, Seq("host"))
      .select(col("page_uri"), col("host"), col("rank_micro"))
  }

  private val AnchorTopK = 10

  /** ANCHOR-TEXT RETRIEVAL — rank crawl targets by what the pages
    * LINKING to them say (the classic web-search signal: anchors
    * describe a target better than the target describes itself, and
    * they exist even for pages never fetched). The anchor document of
    * target (tid, tr) is the bag of every anchor whose link points at
    * it; BM25 runs over those documents with doc_id = tid·100 + tr.
    * Bag-of-words scoring is ORDER-INVARIANT, so the nondeterministic
    * collect_list order inside the anchor concat cannot move a score —
    * tf, dl, and df all count token multiplicity only. Workload: the
    * five formula topics. */
  def bm25AnchorsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val links = LinkGraphOps.extractLinks(
      crawlPages(spark, sfDir), "page_uri", "html")
    val anchorDocs = links.select(
        regexp_extract(col("dst_uri"), "/(\\d+)/(\\d+)$", 1)
          .cast("long").as("tid"),
        regexp_extract(col("dst_uri"), "/(\\d+)/(\\d+)$", 2)
          .cast("long").as("tr"),
        col("anchor_text"))
      .groupBy(col("tid"), col("tr"))
      .agg(concat_ws(" ", collect_list(col("anchor_text")))
        .as("anchors"))
      .select((col("tid") * 100 + col("tr")).as("doc_id"), col("anchors"))
    val workload = spark.range(5L).select(col("id").as("query_id"),
      concat(lit("topic"), col("id").cast("string")).as("query_text"))
    graft.pipeline.RetrievalOps.bm25TopK(anchorDocs, "anchors", "doc_id",
      workload, "query_id", "query_text", AnchorTopK)
  }

  /** The anchor-token relation rebuilt from the link formulas (two
    * tokens per link: the unique anchor id and its topic), then the
    * SHARED BM25 scoring CTEs ([[RetrievalQueries.bm25CtesFromTok]]) —
    * one scorer oracle across substrates, like the PageRank steps. */
  def bm25AnchorsSql: String =
    s"""WITH ids AS (
       |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
       |), resp AS (
       |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
       |), pg AS (
       |  SELECT wid, r FROM resp WHERE (wid + r) % 5 != 0
       |), lnk AS (
       |  SELECT wid, r, unnest(range(0, 1 + (wid + r) % 3)) AS j FROM pg
       |), tgt AS (
       |  SELECT wid, r, j,
       |    (wid * 5 + r * 3 + j * 11) % 40 AS tid,
       |    (wid + 2 * r + j) % 4 AS tr
       |  FROM lnk
       |), tok AS (
       |  SELECT tid * 100 + tr AS doc_id,
       |    unnest(['a' || wid || '_' || r || '_' || j,
       |            'topic' || ((wid + r + 2 * j) % 5)]) AS token
       |  FROM tgt
       |), q AS (
       |  SELECT i AS query_id, 'topic' || i AS query_text
       |  FROM (SELECT unnest(range(0, 5)) AS i)
       |), ${RetrievalQueries.bm25CtesFromTok}
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", doc_id, score_micro
       |FROM ranked WHERE rnk <= $AnchorTopK""".stripMargin

  def rankFrontierSql: String =
    s"""WITH ids AS (
       |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
       |), resp AS (
       |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
       |), pg AS (
       |  SELECT wid, r FROM resp WHERE (wid + r) % 5 != 0
       |), lnk AS (
       |  SELECT wid, r, unnest(range(0, 1 + (wid + r) % 3)) AS j FROM pg
       |), e AS (
       |  SELECT 'h' || (wid % 7) || '.test' AS src,
       |    'h' || (((wid * 5 + r * 3 + j * 11) % 40) % 7) || '.test' AS dst,
       |    count(*) AS w
       |  FROM lnk
       |  WHERE wid % 7 != ((wid * 5 + r * 3 + j * 11) % 40) % 7
       |  GROUP BY 1, 2
       |), $prCtes
       |SELECT 'http://h' || (p.wid % 7) || '.test/' || p.wid || '/' || p.r
       |    AS page_uri,
       |  'h' || (p.wid % 7) || '.test' AS host,
       |  rk.r AS rank_micro
       |FROM pg p
       |JOIN r$PrIters rk ON rk.host = 'h' || (p.wid % 7) || '.test'""".stripMargin
}
