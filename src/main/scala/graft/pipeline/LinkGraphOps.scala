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

  /** Edge weights must be strictly positive — a zero or negative
    * weight would corrupt the rank silently (an all-zero out-weight
    * divides to NULL shares, a negative one breaks monotonicity), so
    * the guard rides IN-PLAN on the delta-sized relation and fails the
    * job naming the edge. */
  private def positiveWeight(w: Column, src: Column, dst: Column): Column =
    when(w > 0, w).otherwise(raise_error(concat(
      lit("host graph: non-positive edge weight "), w.cast("string"),
      lit(" on ("), src.cast("string"), lit(" -> "), dst.cast("string"),
      lit(")"))).cast("long"))

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

  /** Unaggregated host-edge rows, one per kept link, weight 1 —
    * MAP-ONLY, so it composes with a STREAMING link relation (the
    * continuous crawl→graph loop rolls these up per micro-batch inside
    * the store's own fold instead of aggregating here). Drop rules are
    * the host-graph convention: intra-host edges out (they dominate
    * raw counts and carry no cross-site authority), unparseable URIs
    * (empty host) out. */
  def hostLinkRows(links: DataFrame, srcUriCol: String,
                   dstUriCol: String): DataFrame =
    links.select(hostOf(col(srcUriCol)).as("src_host"),
        hostOf(col(dstUriCol)).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .withColumn("w", lit(1L))

  /** Page-level links rolled up to the HOST graph: (src_host,
    * dst_host, n_links) — [[hostLinkRows]] plus ONE partial-aggregated
    * shuffle on the host pair. */
  def hostGraph(links: DataFrame, srcUriCol: String,
                dstUriCol: String): DataFrame =
    hostLinkRows(links, srcUriCol, dstUriCol)
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
      col(dstCol).as("__pr_dst"),
      positiveWeight(col(weightCol).cast("long"), col(srcCol),
        col(dstCol)).as("__pr_w"))
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

  /** [[pageRankHosts]] COMPLETED with the two standard refinements the
    * simple form documents away (Page et al. 1999 §2.4–2.6):
    *
    *  - DANGLING-MASS REDISTRIBUTION: a host with no out-edges (a
    *    destination never seen as a source) no longer drops its mass —
    *    each step, the dangling hosts' total rank Dⁱ⁻¹ is shared
    *    equally: every host's inflow gains ⌊Dⁱ⁻¹ / N⌋ before damping.
    *    Integer-exact recurrence:
    *
    *      rankⁱ(v) = (1000−d)·1000
    *                 + ⌊d·(Σ_{u→v} ⌊rankⁱ⁻¹(u)·share_ppm(u→v)/10⁶⌋
    *                      + ⌊Dⁱ⁻¹/N⌋) / 1000⌋
    *
    *  - L1 EARLY STOP: with `l1StopMicro = Some(ε)`, iteration halts
    *    once Σ_v |rankⁱ(v) − rankⁱ⁻¹(v)| ≤ ε (Some(0) = run to the
    *    exact integer fixed point), else after `maxIterations`. The
    *    delta is one host-sized join + aggregate per step.
    *
    * Per-step driver traffic is two SCALARS (the dangling mass and the
    * delta), each from a host-sized aggregate over the already-severed
    * rank relation — never a corpus-sized job; carrying them as plan
    * literals keeps every iteration's plan a plain equi-join (no
    * one-row cross join, so the registry plan audit stays clean).
    * Overflow headroom is [[pageRankHosts]]'s, plus redistribution:
    * total mass is now CONSERVED at ≤ n_hosts·10⁶ instead of
    * shrinking, which the same ~9.2·10¹² single-host bound already
    * covers. */
  def pageRankHostsFull(edges: DataFrame, srcCol: String, dstCol: String,
                        weightCol: String, maxIterations: Int,
                        dampingMilli: Long = 850L,
                        l1StopMicro: Option[Long] = None): DataFrame =
    pageRankHostsFullCore(edges, srcCol, dstCol, weightCol,
      maxIterations, dampingMilli, l1StopMicro)._1

  /** The core with the iteration count exposed (spec hook: early stop
    * must actually stop early, not just converge by accident). */
  private[graft] def pageRankHostsFullCore(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxIterations: Int, dampingMilli: Long,
      l1StopMicro: Option[Long]): (DataFrame, Int) = {
    require(maxIterations >= 1 && maxIterations <= 100,
      s"maxIterations must be in 1..100, got $maxIterations")
    require(dampingMilli >= 0L && dampingMilli <= 1000L,
      s"dampingMilli must be in 0..1000, got $dampingMilli")
    l1StopMicro.foreach(e => require(e >= 0L,
      s"l1StopMicro must be >= 0, got $e"))
    val e0 = edges.select(col(srcCol).as("__pr_src"),
      col(dstCol).as("__pr_dst"),
      positiveWeight(col(weightCol).cast("long"), col(srcCol),
        col(dstCol)).as("__pr_w"))
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
    val dangling = Checkpoints.sever(nodes.join(
      e.select(col("__pr_src").as("host")).distinct(),
      Seq("host"), "left_anti"))
    val nHosts = nodes.count()
    // loud named failure instead of a bare ArithmeticException from
    // the dangling-mass division below (the module's convention)
    require(nHosts > 0L,
      "pageRankHostsFull: the edge relation is empty — no hosts to " +
        "rank (check the src/dst columns or the upstream link filter)")
    val base = (1000L - dampingMilli) * 1000L
    var rank = nodes.select(col("host"), lit(1000000L).as("rank_micro"))
    var iters = 0
    var done = false
    while (iters < maxIterations && !done) {
      val dMass = rank.join(dangling, Seq("host"), "left_semi")
        .agg(coalesce(sum(col("rank_micro")), lit(0L)))
        .collect()(0).getLong(0)
      val redist = dMass / nHosts // both non-negative: floor division
      val contrib = e.join(rank, col("__pr_src") === col("host"))
        .groupBy(col("__pr_dst"))
        .agg(sum(div(col("rank_micro") * col("__pr_share"), lit(1000000L)))
          .as("__pr_in"))
      val next = Checkpoints.sever(
        nodes.join(contrib, col("host") === col("__pr_dst"), "left")
          .select(col("host"),
            (lit(base) + div(lit(dampingMilli) *
              (coalesce(col("__pr_in"), lit(0L)) + lit(redist)),
              lit(1000L)))
              .as("rank_micro")))
      iters += 1
      l1StopMicro.foreach { eps =>
        val delta = next.join(
            rank.select(col("host"), col("rank_micro").as("__pr_prev")),
            Seq("host"))
          .agg(coalesce(sum(abs(col("rank_micro") - col("__pr_prev"))),
            lit(0L)))
          .collect()(0).getLong(0)
        if (delta <= eps) done = true
      }
      rank = next
    }
    (rank, iters)
  }

  // ---- stored host-graph lifecycle ----------------------------------------
  //
  // The PERSISTED form of the host graph — crawl-graph analytics'
  // managed artifact (the fourteenth lifecycle): each crawl segment's
  // out-link rollup folds into a maintained edge store, and ranks
  // serve from the store without re-walking any crawl. Shared
  // discipline, with ONE structural difference from the id-keyed
  // indexes: edge weights are VALUE FOLDS (associative sums), so
  // epochs hold delta rollups and the read-side sum-merges —
  //
  //   path/edges/e<N>     (src_host, dst_host, w) — one DELTA rollup
  //                       per epoch (already merged per pair within
  //                       the epoch); the live window is [base, epoch]
  //   path/segments/e<N>  the covered-segment LEDGER (carried forward
  //                       on every commit; the quantile-index pattern)
  //   path/meta           window + row/weight counters + applied batch
  //                       id, swapped LAST (MetaIO.swapMetaRow)
  //
  // Appends are DELTA-sized (never rescan stored edges — the retrieval
  // index's append economy applied to a value fold); the read
  // ([[readStoredHostGraph]]) pays one bounded groupBy over the
  // window's union (distinct host pairs ≪ corpus — a merge the rank's
  // own out-weight rollup needs anyway); compaction folds the window
  // into one epoch, bounding both file count and merge width, and
  // CONSERVES total weight (the auditable invariant — raw sums
  // commute with the fold). Re-drop semantics are the quantile
  // index's, stated plainly: weighted edges carry no row identity an
  // anti-join could key on, so a re-dropped slice double-counts
  // through the plain append; streams get the exactly-once batch
  // pointer ([[ingestHostGraphBatch]]), orchestrators the opt-in
  // covered-segment ledger ([[ingestHostGraphSegment]]).

  private[graft] final case class HostGraphMeta(
      epoch: Long, base: Long, rowCount: Long, totalW: Long,
      lastBatchId: Long = -1L)

  private[graft] def edgesDir(path: String, epoch: Long): String =
    s"$path/edges/e$epoch"

  private def segmentsDir(path: String, epoch: Long): String =
    s"$path/segments/e$epoch"

  private[graft] def readHostGraphMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): HostGraphMeta = {
    val r = MetaIO.readMetaRow(spark, path, "host-graph index", "index")
    HostGraphMeta(r.getAs[Long]("epoch"), r.getAs[Long]("base"),
      r.getAs[Long]("row_count"), r.getAs[Long]("total_w"),
      r.getAs[Long]("last_batch_id"))
  }

  private def swapHostGraphMeta(spark: org.apache.spark.sql.SparkSession,
                                path: String, meta: HostGraphMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "host-graph index",
      Seq((meta.epoch, meta.base, meta.rowCount, meta.totalW,
          meta.lastBatchId))
        .toDF("epoch", "base", "row_count", "total_w", "last_batch_id"))
  }

  /** The epoch's covered-segment ids; pre-ledger or initial epochs
    * read as empty. */
  private def readSegments(spark: org.apache.spark.sql.SparkSession,
                           path: String, epoch: Long): DataFrame = {
    val d = new org.apache.hadoop.fs.Path(segmentsDir(path, epoch))
    if (epoch >= 0 &&
        d.getFileSystem(spark.sessionState.newHadoopConf()).exists(d))
      spark.read.parquet(d.toString)
    else {
      import spark.implicits._
      Seq.empty[String].toDF("segment_id")
    }
  }

  /** Normalize a caller's edge relation to the stored delta form:
    * (src_host, dst_host, w), merged per pair within the delta. */
  private def deltaOf(edges: DataFrame, srcCol: String, dstCol: String,
                      weightCol: String): DataFrame =
    edges.select(col(srcCol).as("src_host"), col(dstCol).as("dst_host"),
        positiveWeight(col(weightCol).cast("long"), col(srcCol),
          col(dstCol)).as("w"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(sum(col("w")).as("w"))

  /** Write one delta epoch + the carried ledger, then swap meta.
    * Returns nothing; counters are delta-aggregated (one small job),
    * never a window rescan. */
  private def commitEdgeEpoch(spark: org.apache.spark.sql.SparkSession,
                              path: String, delta: DataFrame,
                              prior: Option[HostGraphMeta], epoch: Long,
                              lastBatchId: Long,
                              segments: Option[DataFrame]): Unit = {
    delta.write.mode("overwrite").parquet(edgesDir(path, epoch))
    segments.getOrElse(readSegments(spark, path, epoch - 1))
      .select(col("segment_id").cast("string").as("segment_id")).distinct()
      .write.mode("overwrite").parquet(segmentsDir(path, epoch))
    val stored = spark.read.parquet(edgesDir(path, epoch))
    val agg = stored.agg(count(lit(1)).as("n"),
      coalesce(sum(col("w")), lit(0L)).as("tw")).collect()(0)
    swapHostGraphMeta(spark, path, HostGraphMeta(
      epoch = epoch, base = prior.map(_.base).getOrElse(epoch),
      rowCount = prior.map(_.rowCount).getOrElse(0L) + agg.getLong(0),
      totalW = prior.map(_.totalW).getOrElse(0L) + agg.getLong(1),
      lastBatchId = lastBatchId))
  }

  /** Build the persisted host graph from an edge snapshot. */
  def writeHostGraphIndex(edges: DataFrame, srcCol: String, dstCol: String,
                          weightCol: String, path: String): Unit = {
    val spark = edges.sparkSession
    commitEdgeEpoch(spark, path, deltaOf(edges, srcCol, dstCol, weightCol),
      prior = None, epoch = 0L, lastBatchId = -1L, segments = None)
  }

  /** Fold a new edge slice in — the daily maintenance move. Cost is
    * delta-sized; NO re-drop protection of its own (weighted edges are
    * identity-free — see [[ingestHostGraphSegment]] for the ledger). */
  def appendHostGraphIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, edges: DataFrame, srcCol: String,
                           dstCol: String, weightCol: String): Unit = {
    val meta = readHostGraphMeta(spark, path)
    commitEdgeEpoch(spark, path, deltaOf(edges, srcCol, dstCol, weightCol),
      prior = Some(meta), epoch = meta.epoch + 1,
      lastBatchId = meta.lastBatchId, segments = None)
  }

  /** EXACTLY-ONCE streaming ingest — the foreachBatch body of a
    * micro-batched edge feed (the [[StatsOps.ingestQuantileBatch]]
    * discipline: sums are not idempotent, so the applied batch id
    * commits behind the same meta swap as the epoch pointer). First
    * batch on an empty path builds; replay of the last batch skips
    * quietly; an id regressing further refuses loudly naming the
    * backfill. Returns whether the batch was applied. */
  def ingestHostGraphBatch(spark: org.apache.spark.sql.SparkSession,
                           path: String, edges: DataFrame, srcCol: String,
                           dstCol: String, weightCol: String,
                           batchId: Long): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "host-graph index", s"$path/edges")
      commitEdgeEpoch(spark, path,
        deltaOf(edges, srcCol, dstCol, weightCol), prior = None,
        epoch = 0L, lastBatchId = batchId, segments = None)
      true
    } else {
      val meta = readHostGraphMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("host-graph index", path,
          batchId, meta.lastBatchId, "edge weights",
          "ingestHostGraphSegment (with a ledger id) or " +
            "appendHostGraphIndex")
        false
      } else {
        commitEdgeEpoch(spark, path,
          deltaOf(edges, srcCol, dstCol, weightCol), prior = Some(meta),
          epoch = meta.epoch + 1, lastBatchId = batchId, segments = None)
        true
      }
    }
  }

  /** LEDGERED fold — the opt-in re-drop protection for orchestrated
    * feeds: when the caller can NAME the slice (a crawl day, a segment
    * path), the name commits in a covered-segments relation behind the
    * same meta swap as the edges, and a re-drop of a covered name is a
    * NO-OP. Returns whether the segment was applied. */
  def ingestHostGraphSegment(spark: org.apache.spark.sql.SparkSession,
                             path: String, edges: DataFrame,
                             srcCol: String, dstCol: String,
                             weightCol: String, segmentId: String)
      : Boolean = {
    import spark.implicits._
    require(segmentId.nonEmpty, "segmentId must be a non-empty name")
    val one = Seq(segmentId).toDF("segment_id")
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "host-graph index", s"$path/edges")
      commitEdgeEpoch(spark, path,
        deltaOf(edges, srcCol, dstCol, weightCol), prior = None,
        epoch = 0L, lastBatchId = -1L, segments = Some(one))
      true
    } else {
      val meta = readHostGraphMeta(spark, path)
      val covered = readSegments(spark, path, meta.epoch)
      if (!covered.filter(col("segment_id") === segmentId).isEmpty)
        false
      else {
        commitEdgeEpoch(spark, path,
          deltaOf(edges, srcCol, dstCol, weightCol), prior = Some(meta),
          epoch = meta.epoch + 1, lastBatchId = meta.lastBatchId,
          segments = Some(covered.unionByName(one)))
        true
      }
    }
  }

  /** The stored graph, sum-merged across the live window — one bounded
    * groupBy over distinct host pairs, resolved from ONE meta read (a
    * probe racing an append sees one consistent snapshot). */
  def readStoredHostGraph(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame =
    readStoredHostGraphAt(spark, path, readHostGraphMeta(spark, path))

  /** The merged window AT a caller-resolved meta snapshot — so a
    * caller that already read meta (compaction: the same snapshot
    * names its write target AND its merge window) cannot straddle two
    * snapshots across a concurrent append. */
  private def readStoredHostGraphAt(spark: org.apache.spark.sql.SparkSession,
                                    path: String,
                                    meta: HostGraphMeta): DataFrame =
    spark.read.parquet(
        (meta.base to meta.epoch).map(edgesDir(path, _)): _*)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(sum(col("w")).as("w"))

  /** Compact the window into ONE merged epoch and re-base the pointer
    * — bounds file count and merge width; total weight is CONSERVED
    * (sums commute with the fold), which [[readHostGraphMeta]] records
    * and a spec pins. Prunes generations below the OLD base with one
    * commit's grace (the shared janitor). */
  def compactHostGraphIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readHostGraphMeta(spark, path)
    // the ONE meta read names both the merge window and the write
    // target: re-reading meta inside the merge would let a concurrent
    // append land between the two reads and collide edgesDir(next)
    // with the appended epoch
    val merged = readStoredHostGraphAt(spark, path, meta)
      .repartition(targetFiles)
    val next = meta.epoch + 1
    merged.write.mode("overwrite").parquet(edgesDir(path, next))
    readSegments(spark, path, meta.epoch)
      .write.mode("overwrite").parquet(segmentsDir(path, next))
    val stored = spark.read.parquet(edgesDir(path, next))
    val agg = stored.agg(count(lit(1)).as("n"),
      coalesce(sum(col("w")), lit(0L)).as("tw")).collect()(0)
    require(agg.getLong(1) == meta.totalW,
      s"host-graph compaction at $path would change total weight " +
        s"${meta.totalW} -> ${agg.getLong(1)} — merge bug, refusing " +
        "the swap")
    swapHostGraphMeta(spark, path, meta.copy(epoch = next, base = next,
      rowCount = agg.getLong(0)))
    MetaIO.pruneEpochs(spark, Seq(s"$path/edges", s"$path/segments"),
      superseded = meta.base)
  }

  /** Compact when the live window has grown to `maxEpochs` dirs or
    * more — the policy wrapper the continuous maintainer calls. */
  def maybeCompactHostGraphIndex(spark: org.apache.spark.sql.SparkSession,
                                 path: String, maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readHostGraphMeta(spark, path)
    if (meta.epoch - meta.base + 1 >= maxEpochs) {
      compactHostGraphIndex(spark, path)
      true
    } else false
  }

  /** PageRank off the STORED graph — the serving path: output ≡
    * [[pageRankHosts]] over the union of every edge slice ever folded
    * in (weights are associative sums), with no crawl re-walk
    * anywhere. */
  def pageRankStoredGraph(spark: org.apache.spark.sql.SparkSession,
                          path: String, iterations: Int,
                          dampingMilli: Long = 850L): DataFrame =
    pageRankHosts(readStoredHostGraph(spark, path), "src_host",
      "dst_host", "w", iterations, dampingMilli)
}
