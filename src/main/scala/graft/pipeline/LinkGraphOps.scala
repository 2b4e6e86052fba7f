package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-graph analytics — the out-link relation and host-level
  * PageRank (Page et al. 1999, "The PageRank Citation Ranking"), the
  * standard crawl-frontier prioritizer: a 100-TB crawl decides what to
  * fetch next by host authority, and a training-data pipeline reuses
  * the same scores as a document quality prior (Common Crawl publishes
  * exactly this relation as its host-level ranks).
  *
  * Everything here is INTEGER-EXACT (the repo-wide fixed-point
  * discipline): ranks are carried in micro-units, per-edge weight
  * shares in parts-per-million, and every division is a floor division
  * over non-negative operands — so a K-iteration run is
  * bit-reproducible at any parallelism and carries an exact SQL oracle.
  *
  * Scale shape: link extraction is map-only over the pages; the host
  * rollup is ONE partial-aggregated corpus shuffle; and each PageRank
  * iteration is HOST-proportional, not corpus-proportional — one
  * equi-join of the (severed, reused) share relation against the
  * host-sized rank relation plus one partial-aggregated rollup on the
  * destination host. The rank relation is severed every iteration so
  * the K-step loop stays a flat plan over small relations instead of a
  * K-deep lineage re-running the corpus extraction. */
object LinkGraphOps {

  /** The `<a href>anchor</a>` pattern [[extractLinks]] mines — href
    * required, anchor text may be empty; same pattern semantics in
    * Java regex (Spark) and RE2, the swap-your-own-extractor seam
    * ([[TextOps.redactPii]] pattern-pack convention). */
  val ATagPattern: String = "<a href=\"([^\"]+)\">([^<]*)</a>"

  private def div(a: Column, b: Column): Column = call_function("div", a, b)

  /** Every `<a href>` out-link of every crawled page — map-only.
    * Output: (src_uri, dst_uri, anchor_text), one row per tag
    * occurrence, anchors paired positionally with their hrefs. */
  def extractLinks(pages: DataFrame, pageUriCol: String,
                   htmlCol: String): DataFrame =
    pages.select(col(pageUriCol).as("src_uri"),
        regexp_extract_all(col(htmlCol), lit(ATagPattern), lit(1))
          .as("__dsts"),
        regexp_extract_all(col(htmlCol), lit(ATagPattern), lit(2))
          .as("__txts"))
      .select(col("src_uri"), col("__txts"),
        posexplode(col("__dsts")).as(Seq("__j", "dst_uri")))
      .select(col("src_uri"), col("dst_uri"),
        element_at(col("__txts"), col("__j") + 1).as("anchor_text"))

  /** The host (authority component) of a URI; empty string when the
    * URI has no scheme://host shape. Deliberately simple — a
    * production system swaps its canonicalizer in at this seam. */
  def hostOf(uri: Column): Column =
    regexp_extract(uri, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** Page-level links rolled up to the HOST graph: (src_host,
    * dst_host, n_links). Intra-host edges are dropped (they dominate
    * raw link counts and carry no cross-site authority — the standard
    * host-graph convention), as are links whose either URI has no
    * parseable host. ONE partial-aggregated shuffle on the host pair. */
  def hostGraph(links: DataFrame, srcUriCol: String,
                dstUriCol: String): DataFrame =
    links.select(hostOf(col(srcUriCol)).as("src_host"),
        hostOf(col(dstUriCol)).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Weighted host PageRank, `iterations` fixed synchronous steps of
    * the integer-exact recurrence
    *
    *   share_ppm(u→v) = ⌊10⁶·w(u,v) / Σ_x w(u,x)⌋          (per edge, once)
    *   rank⁰(v)       = 10⁶
    *   rankⁱ(v)       = (1000−d)·1000
    *                    + ⌊d · Σ_{u→v} ⌊rankⁱ⁻¹(u)·share_ppm(u→v) / 10⁶⌋ / 1000⌋
    *
    * with damping d in milli (default 850 ≡ the classic 0.85). Output:
    * (host, rank_micro) over every host that appears as a source or
    * destination. Two documented variant choices, both standard and
    * both what the exact-oracle discipline wants: DANGLING mass is
    * dropped, not redistributed (ranks stay monotone in in-link
    * authority, which is all frontier prioritization and quality
    * priors use), and the floor in share_ppm leaks ≤ outdeg ppm of a
    * node's mass per step (same order as the dangling simplification).
    *
    * Overflow headroom, stated loudly: rankⁱ(v) is bounded by the
    * total surviving mass, ≤ n_hosts·10⁶, and the per-edge product
    * rank·share_ppm must stay under 2⁶³ — safe while the mass
    * funneled into ONE host stays below ~9.2·10¹² micro (≈ 9 million
    * full-mass hosts pointing at one destination with their entire
    * out-weight). Past that corpus scale, start from a smaller
    * per-host mass; the ordering is scale-free. */
  def pageRankHosts(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, iterations: Int,
                    dampingMilli: Long = 850L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in 1..50, got $iterations")
    require(dampingMilli >= 0L && dampingMilli <= 1000L,
      s"dampingMilli must be in 0..1000, got $dampingMilli")
    val e0 = edges.select(col(srcCol).as("__pr_src"),
      col(dstCol).as("__pr_dst"), col(weightCol).cast("long").as("__pr_w"))
    val outw = e0.groupBy(col("__pr_src"))
      .agg(sum(col("__pr_w")).as("__pr_outw"))
    val e = Checkpoints.sever(e0.join(outw, Seq("__pr_src"))
      .select(col("__pr_src"), col("__pr_dst"),
        div(lit(1000000L) * col("__pr_w"), col("__pr_outw"))
          .as("__pr_share")))
    val nodes = Checkpoints.sever(
      e.select(col("__pr_src").as("host"))
        .union(e.select(col("__pr_dst").as("host")))
        .distinct())
    val base = (1000L - dampingMilli) * 1000L
    var rank = nodes.select(col("host"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(rank, col("__pr_src") === col("host"))
        .groupBy(col("__pr_dst"))
        .agg(sum(div(col("rank_micro") * col("__pr_share"), lit(1000000L)))
          .as("__pr_in"))
      rank = Checkpoints.sever(
        nodes.join(contrib, col("host") === col("__pr_dst"), "left")
          .select(col("host"),
            (lit(base) + div(lit(dampingMilli) *
              coalesce(col("__pr_in"), lit(0L)), lit(1000L)))
              .as("rank_micro")))
    }
    rank
  }
}
