package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The managed-artifact dashboard: meta long rows match the typed meta
  * readers exactly, layout rows track the epoch'd relation dirs through
  * append and compaction (including the grace generation), and a broken
  * artifact fails the dashboard loudly instead of vanishing from it. */
class FleetOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fleet_$tag").toString

  private def corpus(ids: Seq[Long]) =
    ids.map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")

  test("meta rows are the typed meta verbatim; layout covers every " +
    "epoch'd relation and follows append + compaction") {
    val rt = tmp("rt") + "/rt"
    val dg = tmp("dg") + "/dg"
    RetrievalOps.writeRetrievalIndex(corpus(0L to 4L), "text", "doc_id", rt)
    RetrievalOps.appendRetrievalIndex(spark, rt, corpus(5L to 7L),
      "text", "doc_id")
    DedupOps.writeDigestIndex(corpus(0L to 4L), "text", dg)
    val arts = Seq("rt" -> rt, "dg" -> dg)

    val meta = FleetOps.artifactMeta(spark, arts).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val rtMeta = RetrievalOps.readRetrievalIndexMeta(spark, rt)
    assert(meta(("rt", "epoch")) == rtMeta.epoch.toString)
    assert(meta(("rt", "base")) == rtMeta.base.toString)
    assert(meta(("rt", "n_docs")) == rtMeta.nDocs.toString)
    assert(meta(("rt", "total_tokens")) == rtMeta.totalTokens.toString)
    assert(meta(("dg", "bloom_bits")) == (1 << 20).toString)
    assert(meta(("dg", "digest_count")) == "5")

    def layout() = FleetOps.artifactLayout(spark, arts).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val l1 = layout()
    // retrieval index: postings + docs relations, epochs {0, 1}
    assert(l1(("rt", "postings"))._1 == 2L)
    assert(l1(("rt", "postings"))._2 == 0L)
    assert(l1(("rt", "postings"))._3 == 1L)
    assert(l1(("rt", "postings"))._4 > 0L) // committed data files
    assert(l1(("rt", "postings"))._5 > 0L) // bytes
    assert(l1(("rt", "docs"))._1 == 2L)
    // digest index: one build epoch in digests + derived bloom epoch
    assert(l1(("dg", "digests"))._1 == 1L)
    assert(l1(("dg", "derived"))._1 == 1L)

    // compaction re-bases the window; the layout keeps exactly one
    // grace generation below it (MetaIO.pruneEpochs's contract)
    RetrievalOps.compactRetrievalIndex(spark, rt)
    val l2 = layout()
    val m2 = RetrievalOps.readRetrievalIndexMeta(spark, rt)
    assert(m2.base == 2L)
    assert(l2(("rt", "postings"))._3 == 2L) // max epoch = new window
    assert(l2(("rt", "postings"))._2 >= 0L) // grace below may remain
    assert(l2(("rt", "postings"))._1 <= 3L)
    // the dashboard health check: layout range COVERS the meta window
    assert(l2(("rt", "postings"))._2 <= m2.base &&
      l2(("rt", "postings"))._3 >= m2.epoch)
  }

  test("a replace-style artifact (the CMS sketch) reads the same way: " +
    "meta verbatim, layout walks BOTH its relations, the grace pair " +
    "bounds every epoch range") {
    val cms = tmp("cms") + "/cms"
    val items = Seq.tabulate(30)(i => (s"g${i % 2}", s"k${i % 7}"))
      .toDF("g", "v")
    StatsOps.writeCmsIndex(items, Seq("g"), col("v"), cms,
      depth = 2, width = 64)
    // a ledgered slice exercises the segments relation in the layout
    StatsOps.ingestCmsSegment(spark, cms,
      Seq(("g0", "extra")).toDF("g", "v"), Seq("g"), col("v"), "day-1")
    val arts = Seq("cms" -> cms)
    val meta = FleetOps.artifactMeta(spark, arts).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    val typed = StatsOps.readCmsIndexMeta(spark, cms)
    assert(meta("depth") == typed.depth.toString &&
      meta("width") == typed.width.toString &&
      meta("group_cols") == "g" &&
      meta("cell_rows") == typed.cellRows.toString &&
      meta("epoch") == typed.epoch.toString &&
      meta("last_batch_id") == typed.lastBatchId.toString)
    val layout = FleetOps.artifactLayout(spark, arts).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(layout.keySet == Set("cells", "segments"),
      s"layout must walk both epoch'd relations, got ${layout.keySet}")
    // replace-style lifecycle: each commit supersedes the prior epoch
    // wholesale, so every relation holds at most the grace pair and
    // the max epoch is the meta pointer
    Seq("cells", "segments").foreach { rel =>
      assert(layout(rel)._1 <= 2L,
        s"$rel holds ${layout(rel)._1} epochs — the grace pair leaked")
      assert(layout(rel)._3 == typed.epoch,
        s"$rel max epoch ${layout(rel)._3} != meta ${typed.epoch}")
      assert(layout(rel)._4 > 0L, s"$rel shows no committed files")
    }
  }

  test("the dashboard reads EVERY MetaIO lifecycle kind in one call: " +
    "meta carries each artifact's epoch, layout covers it") {
    val d = corpus(0L to 7L)
    val arts = Seq(
      "digest" -> { val p = tmp("a_dg") + "/a"
        DedupOps.writeDigestIndex(d, "text", p); p },
      "retrieval" -> { val p = tmp("a_rt") + "/a"
        RetrievalOps.writeRetrievalIndex(d, "text", "doc_id", p); p },
      "minhash" -> { val p = tmp("a_mh") + "/a"
        DedupOps.writeMinhashIndex(d, "text", "doc_id", p); p },
      "lm" -> { val p = tmp("a_lm") + "/a"
        TextOps.writeLmModel(d, "text", "doc_id", p); p },
      "decontam" -> { val p = tmp("a_dc") + "/a"
        TextOps.writeDecontamIndex(d, "text", "doc_id", p, shingleK = 3); p },
      "quantile" -> { val p = tmp("a_qs") + "/a"
        StatsOps.writeQuantileIndex(d.select(col("doc_id"),
          lit("g").as("g")), Seq("g"), col("doc_id"), p); p },
      "hll" -> { val p = tmp("a_hl") + "/a"
        StatsOps.writeHllIndex(d.select(col("doc_id"), lit("g").as("g")),
          Seq("g"), col("doc_id"), p); p },
      "mediahash" -> { val p = tmp("a_im") + "/a"
        MultimodalOps.writeMediaHashIndex(
          MultimodalOps.encodeSyntheticPng(
            d.select(col("doc_id").as("k")), "k"),
          "content", "media_id", p); p },
      "hostgraph" -> { val p = tmp("a_hg") + "/a"
        LinkGraphOps.writeHostGraphIndex(
          Seq(("a", "b", 2L), ("b", "a", 1L)).toDF("s", "t", "w"),
          "s", "t", "w", p); p },
      "bpe" -> { val p = tmp("a_bp") + "/a"
        TextOps.writeBpeModel(spark,
          Seq((1, "a", "b", 3L), (2, "ab", "c", 2L)), p); p })

    val meta = FleetOps.artifactMeta(spark, arts).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val layout = FleetOps.artifactLayout(spark, arts).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val names = arts.map(_._1)
    // every lifecycle contributes its meta epoch (all fresh builds: 0)
    names.foreach { n =>
      assert(meta((n, "epoch")) == "0", s"$n meta epoch")
    }
    // every lifecycle's every epoch'd relation sits AT the meta epoch
    // with committed bytes — the generic health read
    assert(layout.map(_._1._1).distinct.sorted.toSeq == names.sorted)
    layout.foreach { case ((n, rel), (mn, mx, files, bytes)) =>
      assert(mn == 0L && mx >= 0L && files > 0L && bytes > 0L,
        s"$n/$rel layout ($mn,$mx,$files,$bytes)")
      assert(mx <= 1L, s"$n/$rel unexpectedly deep window") // e0 (+derived)
    }
  }

  test("a missing artifact fails the meta dashboard loudly; a path " +
    "with no epoch'd relations contributes no layout rows") {
    val e = intercept[IllegalStateException] {
      FleetOps.artifactMeta(spark, Seq("ghost" -> (tmp("ghost") + "/x")))
    }
    assert(e.getMessage.contains("ghost"))
    val empty = tmp("flat")
    new java.io.File(s"$empty/notepochs/child").mkdirs()
    assert(FleetOps.artifactLayout(spark,
      Seq("flat" -> empty)).count() == 0L)
  }
}
