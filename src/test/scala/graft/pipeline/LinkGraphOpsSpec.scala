package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-graph analytics: link extraction with positional anchor
  * pairing, the host rollup's drop rules, and integer-exact PageRank
  * against an independent JVM brute force (including a dangling host,
  * multi-edges, and damping sweep); the crawl→graph composition is
  * pinned against the generator formulas. */
class LinkGraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- extraction ----------------------------------------------------

  test("extractLinks: one row per tag, anchors paired positionally; " +
    "pages without links emit nothing") {
    val pages = Seq(
      ("http://a.test/p0",
        """<html><body><a href="http://b.test/x">first</a>mid""" +
          """<a href="http://c.test/y"></a></body></html>"""),
      ("http://a.test/p1", "<html><body>no links</body></html>"))
      .toDF("uri", "html")
    val got = LinkGraphOps.extractLinks(pages, "uri", "html")
      .orderBy("dst_uri").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq(
      ("http://a.test/p0", "http://b.test/x", "first"),
      ("http://a.test/p0", "http://c.test/y", "")))
  }

  // ---- host rollup ----------------------------------------------------

  test("hostGraph: intra-host edges and unparseable URIs drop; " +
    "multi-edges count") {
    val links = Seq(
      ("http://a.test/1", "http://b.test/1", "x"),
      ("http://a.test/2", "http://b.test/9", "y"), // same host pair
      ("http://a.test/3", "http://a.test/4", "self"), // intra-host
      ("nohost", "http://b.test/1", "bad src"),
      ("http://a.test/5", "also-no-host", "bad dst"))
      .toDF("src_uri", "dst_uri", "anchor_text")
    val got = LinkGraphOps.hostGraph(links, "src_uri", "dst_uri").collect()
    assert(got.length === 1)
    assert((got(0).getString(0), got(0).getString(1), got(0).getLong(2)) ===
      ("a.test", "b.test", 2L))
  }

  // ---- PageRank vs JVM brute force -------------------------------------

  private def bruteRank(edges: Seq[(String, String, Long)], iters: Int,
                        d: Long = 850L): Map[String, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val share = edges.map { case (s, t, w) => (s, t, 1000000L * w / outw(s)) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = share.groupBy(_._2).view.mapValues(
        _.map { case (s, _, sh) => rank(s) * sh / 1000000L }.sum).toMap
      rank = nodes.map(n =>
        n -> ((1000L - d) * 1000L + d * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    rank
  }

  private def runRank(edges: Seq[(String, String, Long)], iters: Int,
                      d: Long = 850L): Map[String, Long] =
    LinkGraphOps.pageRankHosts(
        edges.toDF("src", "dst", "w"), "src", "dst", "w", iters, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val graph = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
    ("c", "a", 1L), ("a", "d", 1L)) // d is dangling (no out-edges)

  test("pageRankHosts ≡ JVM brute force across iteration counts; a " +
    "dangling host holds exactly the base after every step") {
    for (k <- Seq(1, 3, 5)) {
      val got = runRank(graph, k)
      assert(got === bruteRank(graph, k), s"iters=$k")
    }
    // d has in-links, so it ranks above base; give it none and it IS base
    val noIn = runRank(Seq(("a", "b", 1L), ("c", "b", 1L)), 3)
    assert(noIn("a") === 150000L && noIn("c") === 150000L)
    assert(noIn("b") > 150000L)
  }

  test("damping sweep: d=0 is all-base; d=1000 keeps full mass moving") {
    assert(runRank(graph, 2, 0L).values.toSet === Set(1000000L))
    assert(runRank(graph, 2, 1000L) === bruteRank(graph, 2, 1000L))
  }

  test("authority ordering: the host every other host points at " +
    "outranks the rest") {
    // pure star (hub dangling): converges exactly by step 2 —
    // spokes hold the base, the hub holds base + d·3·base/1000.
    // (a hub→spoke BACK-edge would 2-cycle the whole mass and make
    // ranks K-parity-dependent — synchronous PageRank oscillates on
    // bipartite mass loops; damping bounds but doesn't kill it)
    val star = Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L))
    val got = runRank(star, 4)
    assert(got("hub") === 150000L + 850L * (3L * 150000L) / 1000L)
    assert(got("a") === 150000L && got("b") === 150000L &&
      got("c") === 150000L)
  }

  test("validation: iteration and damping bounds refuse loudly") {
    val e = graph.toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      LinkGraphOps.pageRankHosts(e, "src", "dst", "w", 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraphOps.pageRankHosts(e, "src", "dst", "w", 3, 1001L)
    }
  }

  // ---- completed recurrence: redistribution + early stop ---------------

  /** JVM brute force of the REDISTRIBUTED recurrence — the Spark loop's
    * scaladoc formulas in plain Scala. */
  private def bruteRankFull(edges: Seq[(String, String, Long)], iters: Int,
                            d: Long = 850L): Map[String, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val share = edges.map { case (s, t, w) => (s, t, 1000000L * w / outw(s)) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val dangling = nodes.filterNot(outw.contains).toSet
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val dm = dangling.toSeq.map(rank).sum
      val redist = dm / nodes.size
      val in = share.groupBy(_._2).view.mapValues(
        _.map { case (s, _, sh) => rank(s) * sh / 1000000L }.sum).toMap
      rank = nodes.map(n =>
        n -> ((1000L - d) * 1000L +
          d * (in.getOrElse(n, 0L) + redist) / 1000L)).toMap
    }
    rank
  }

  private def runRankFull(edges: Seq[(String, String, Long)], iters: Int,
                          eps: Option[Long] = None): (Map[String, Long], Int) = {
    val (df, n) = LinkGraphOps.pageRankHostsFullCore(
      edges.toDF("src", "dst", "w"), "src", "dst", "w", iters, 850L, eps)
    (df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, n)
  }

  test("pageRankHostsFull ≡ JVM brute force of the redistributed " +
    "recurrence; the dangling host's mass provably flows back") {
    for (k <- Seq(1, 3, 5)) {
      val (got, n) = runRankFull(graph, k)
      assert(n == k)
      assert(got === bruteRankFull(graph, k), s"iters=$k")
    }
    // redistribution is LIVE on this graph: the simple form drops d's
    // mass, the full form hands everyone ⌊D/N⌋ — so every host with
    // no in-flow ranks strictly above its simple-form self
    val simple = runRank(graph, 3)
    val (full, _) = runRankFull(graph, 3)
    assert(full.values.sum > simple.values.sum,
      "redistribution must conserve mass the simple form drops")
    // a graph with NO dangling host: both forms agree exactly
    val cyc = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L))
    assert(runRankFull(cyc, 4)._1 === runRank(cyc, 4))
  }

  test("L1 early stop fires at the FIRST step whose delta clears eps " +
    "and returns exactly that step's ranks") {
    // the star's deltas shrink geometrically (damping 0.85), so an
    // eps of 1000 micro fires well inside the 50-step budget; the
    // brute trajectory pins both the stopping step and the returned
    // ranks
    val star = Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L))
    val eps = 1000L
    val (early, iters) = runRankFull(star, 50, eps = Some(eps))
    assert(iters < 50, s"early stop never fired: ran $iters iterations")
    assert(early === bruteRankFull(star, iters),
      "early stop must return the stopping step's exact ranks")
    def l1(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keysIterator.map(k => math.abs(a(k) - b(k))).sum
    assert(l1(bruteRankFull(star, iters),
      bruteRankFull(star, iters - 1)) <= eps,
      "the stopping step's delta must clear eps")
    assert(iters >= 2 && l1(bruteRankFull(star, iters - 1),
      bruteRankFull(star, iters - 2)) > eps,
      "the step before must NOT have cleared eps (first-crossing stop)")
    // eps disabled runs the whole budget
    assert(runRankFull(star, 7)._2 == 7)
    // eps validation
    intercept[IllegalArgumentException] {
      LinkGraphOps.pageRankHostsFull(star.toDF("src", "dst", "w"),
        "src", "dst", "w", 5, 850L, Some(-1L))
    }
  }

  test("a non-positive edge weight fails the job naming the edge — " +
    "both at the rank intake and the stored fold (a zero out-weight " +
    "would otherwise divide to NULL shares silently)") {
    val bad = Seq(("a", "b", 0L)).toDF("src", "dst", "w")
    val e1 = intercept[Exception] {
      LinkGraphOps.pageRankHosts(bad, "src", "dst", "w", 1).collect()
    }
    assert(e1.getMessage.contains("non-positive edge weight"))
    val e2 = intercept[Exception] {
      LinkGraphOps.writeHostGraphIndex(bad, "src", "dst", "w",
        tmp("badw"))
    }
    assert(e2.getMessage.contains("non-positive edge weight"))
  }

  // ---- the stored host-graph lifecycle ---------------------------------

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lg_$tag").toString + "/g"

  private def edgesDf(rows: Seq[(String, String, Long)]) =
    rows.toDF("src", "dst", "w")

  private def storedEdges(path: String): Map[(String, String), Long] =
    LinkGraphOps.readStoredHostGraph(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private val s0 = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L))
  private val s2 = Seq(("a", "b", 1L), ("a", "d", 2L))
  private val s3 = Seq(("d", "a", 5L))

  private def bruteSum(slices: Seq[(String, String, Long)]*)
      : Map[(String, String), Long] =
    slices.flatten.groupBy(e => (e._1, e._2))
      .view.mapValues(_.map(_._3).sum).toMap

  test("stored host graph: ledgered slices sum-merge; a re-dropped " +
    "segment adds NOTHING; unledgered appends compose; ranks off the " +
    "store equal the one-shot scorer over the union") {
    val dir = tmp("life")
    LinkGraphOps.writeHostGraphIndex(edgesDf(s0), "src", "dst", "w", dir)
    assert(LinkGraphOps.ingestHostGraphSegment(spark, dir, edgesDf(s2),
      "src", "dst", "w", "seg-2"))
    assert(!LinkGraphOps.ingestHostGraphSegment(spark, dir, edgesDf(s2),
      "src", "dst", "w", "seg-2"), "re-drop must be a no-op")
    assert(storedEdges(dir) === bruteSum(s0, s2))
    LinkGraphOps.appendHostGraphIndex(spark, dir, edgesDf(s3),
      "src", "dst", "w")
    assert(storedEdges(dir) === bruteSum(s0, s2, s3))
    // the ledger survived the unledgered append
    assert(!LinkGraphOps.ingestHostGraphSegment(spark, dir, edgesDf(s2),
      "src", "dst", "w", "seg-2"))
    val stored = LinkGraphOps.pageRankStoredGraph(spark, dir, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = runRank(
      bruteSum(s0, s2, s3).toSeq.map { case ((s, t), w) => (s, t, w) }, 3)
    assert(stored === oneShot)
  }

  test("stored host graph: compaction conserves total weight, leaves " +
    "the probe identical, folds the window, and the janitor keeps one " +
    "grace generation") {
    val dir = tmp("compact")
    LinkGraphOps.writeHostGraphIndex(edgesDf(s0), "src", "dst", "w", dir)
    LinkGraphOps.appendHostGraphIndex(spark, dir, edgesDf(s2),
      "src", "dst", "w")
    LinkGraphOps.appendHostGraphIndex(spark, dir, edgesDf(s3),
      "src", "dst", "w")
    val before = storedEdges(dir)
    val mBefore = LinkGraphOps.readHostGraphMeta(spark, dir)
    assert(mBefore.epoch === 2L && mBefore.base === 0L)
    assert(mBefore.totalW === (s0 ++ s2 ++ s3).map(_._3).sum)
    LinkGraphOps.compactHostGraphIndex(spark, dir)
    val mAfter = LinkGraphOps.readHostGraphMeta(spark, dir)
    assert(mAfter.base === 3L && mAfter.epoch === 3L)
    assert(mAfter.totalW === mBefore.totalW) // conserved
    assert(mAfter.rowCount === before.size.toLong) // merged pair count
    assert(storedEdges(dir) === before)
    // epochs strictly below the OLD base pruned; the old window is the
    // grace generation here (base was 0 — nothing below it to prune),
    // so a second compact prunes the first window
    LinkGraphOps.appendHostGraphIndex(spark, dir, edgesDf(s3),
      "src", "dst", "w")
    LinkGraphOps.compactHostGraphIndex(spark, dir)
    val live = new java.io.File(s"$dir/edges").listFiles()
      .map(_.getName).toSet
    assert(!live.contains("e0") && !live.contains("e1") &&
      !live.contains("e2"), s"old generations must prune, saw $live")
    assert(live.contains("e3") && live.contains("e5"), // grace + current
      s"grace + current expected, saw $live")
  }

  test("stored host graph: ingest batch discipline — first batch " +
    "builds, replay skips quietly, a regressing id refuses loudly, " +
    "orphan data refuses a rebuild") {
    val dir = tmp("ingest")
    assert(LinkGraphOps.ingestHostGraphBatch(spark, dir, edgesDf(s0),
      "src", "dst", "w", batchId = 0L))
    assert(LinkGraphOps.ingestHostGraphBatch(spark, dir, edgesDf(s2),
      "src", "dst", "w", batchId = 1L))
    // replay of the last batch: quiet no-op
    assert(!LinkGraphOps.ingestHostGraphBatch(spark, dir, edgesDf(s2),
      "src", "dst", "w", batchId = 1L))
    assert(storedEdges(dir) === bruteSum(s0, s2))
    val e = intercept[IllegalArgumentException] {
      LinkGraphOps.ingestHostGraphBatch(spark, dir, edgesDf(s3),
        "src", "dst", "w", batchId = -5L)
    }
    assert(e.getMessage.contains("appendHostGraphIndex"))
    // a data relation with no recoverable meta refuses the rebuild
    val orphan = tmp("orphan")
    edgesDf(s0).write.parquet(
      LinkGraphOps.edgesDir(orphan, 0L))
    val e2 = intercept[IllegalArgumentException] {
      LinkGraphOps.ingestHostGraphBatch(spark, orphan, edgesDf(s0),
        "src", "dst", "w", batchId = 0L)
    }
    assert(e2.getMessage.contains("refusing to build over"))
  }

  // ---- the crawl→graph composition vs the generator formulas -----------

  test("linked-crawl composition: walk → extract → hostGraph matches " +
    "the formula-derived edge rollup, and PageRank runs on it") {
    val ids = Seq(0L, 1L, 5L, 12L, 39L)
    val warcs = WarcOps.encodeSyntheticWarcGzLinked(
      ids.toDF("warc_key"), "warc_key")
    val pages = WarcOps.warcRecordsGz(warcs, "content", "media_id")
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("target_uri").as("page_uri"), col("body").as("html"))
    val got = LinkGraphOps.hostGraph(
        LinkGraphOps.extractLinks(pages, "page_uri", "html"),
        "src_uri", "dst_uri")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val expect = (for {
      id <- ids
      r <- 0 until WarcOps.synthWarcResponses(id)
      if WarcOps.synthWarcStatus(id, r) == 200
      j <- 0 until WarcOps.synthWarcLinkCount(id, r)
    } yield {
      val (tid, _) = WarcOps.synthWarcLinkTarget(id, r, j)
      (WarcOps.synthWarcHost(id), WarcOps.synthWarcHost(tid))
    }).filter(p => p._1 != p._2)
      .groupBy(identity).view.mapValues(_.size.toLong)
      .map { case ((s, t), n) => (s, t, n) }.toSet
    assert(got === expect)
    val ranks = LinkGraphOps.pageRankHosts(
      LinkGraphOps.hostGraph(
        LinkGraphOps.extractLinks(pages, "page_uri", "html"),
        "src_uri", "dst_uri"),
      "src_host", "dst_host", "n_links", 3)
    assert(ranks.count() ===
      expect.flatMap(e => Seq(e._1, e._2)).size)
  }
}
