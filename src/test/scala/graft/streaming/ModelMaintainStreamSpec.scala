package graft.streaming

import graft.SparkTestSession
import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 maintenance-symmetry streams: a live document feed
  * keeps the stored LM model current, a live benchmark feed keeps the
  * decontamination index current — each across a restart, each ending
  * byte-identical to the one-shot artifact over the same corpus. */
class ModelMaintainStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mms_$tag").toString

  private def awaitArtifact(q: org.apache.spark.sql.streaming.StreamingQuery,
                            label: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) {
      q.exception.foreach(e => throw e)
      Thread.sleep(100)
    }
    assert(pred, s"timed out waiting for: $label")
  }

  /** Poll-safe artifact read: no meta yet / a racing swap window reads
    * as "not there yet", the next poll resolves. */
  private def tryRows(f: => Set[Seq[Any]]): Set[Seq[Any]] =
    try f
    catch {
      case _: IllegalStateException => Set.empty
      case _: org.apache.spark.SparkException => Set.empty
      // a dir caught BETWEEN an overwrite's delete and its first data
      // file reads as "parquet with no inferable schema" — the same
      // racing-swap window wearing an analyzer face
      case _: org.apache.spark.sql.AnalysisException => Set.empty
    }

  /** doc_ids across an admission loop's fully-committed landing dirs
    * (`b<batchId>`, _SUCCESS lands last): a poll racing an in-flight
    * overwrite must not read a torn dir. */
  private def landedDocIds(out: String): Set[Long] = tryRows {
    val dirs = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("b") &&
        new java.io.File(f, "_SUCCESS").exists)
      .map(_.toString)
    if (dirs.isEmpty) Set.empty
    else spark.read.parquet(dirs: _*).select("doc_id")
      .collect().map(r => Seq[Any](r.getLong(0))).toSet
  }.map(_.head.asInstanceOf[Long])

  /** Poll-safe digest-store meta read: None until the store exists and
    * no swap is in flight. */
  private def storeMeta(path: String): Option[graft.pipeline.DedupOps.DigestIndexMeta] =
    try Some(graft.pipeline.DedupOps.readDigestIndexMeta(spark, path))
    catch {
      case _: IllegalStateException => None
      case _: org.apache.spark.SparkException => None
      case _: org.apache.spark.sql.AnalysisException => None
    }

  test("lmModelMaintainStream: landed document batches keep the stored " +
    "bigram model current across a restart; final scores equal the " +
    "one-shot build; a batch relation is refused") {
    val dir = tmp("lm_feed")
    val model = tmp("lm_model") + "/lm"
    val ckpt = tmp("lm_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    val d1 = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"))
    val d2 = Seq((3L, "a bird flew over the mat"))
    val d3 = Seq((4L, "the cat ran over the rug"))
    val scored = Seq((10L, "the cat sat"), (11L, "a dog flew"))
      .toDF("doc_id", "text")
    def scores(path: String): Set[Seq[Any]] =
      TextOps.scoreAgainstStoredLm(spark, path, scored, "text", "doc_id")
        .collect().map(_.toSeq).toSet
    def start() = PipelineStreams.lmModelMaintainStream(
      spark.readStream.schema(docSchema).parquet(dir),
      model, ckpt, "text", "doc_id")
    // a non-streaming relation must be refused before start()
    intercept[IllegalArgumentException] {
      PipelineStreams.lmModelMaintainStream(
        d1.toDF("doc_id", "text"), model, ckpt, "text", "doc_id")
    }
    // expected artifacts built one-shot per coverage level
    val exp12 = tmp("lm_e12") + "/lm"
    val exp123 = tmp("lm_e123") + "/lm"
    TextOps.writeLmModel((d1 ++ d2).toDF("doc_id", "text"), "text",
      "doc_id", exp12)
    TextOps.writeLmModel((d1 ++ d2 ++ d3).toDF("doc_id", "text"), "text",
      "doc_id", exp123)
    drop(d1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first batch folded")(
        tryRows(scores(model)).nonEmpty)
      drop(d2) // lands mid-flight
      awaitArtifact(q1, "second batch folded")(
        tryRows(scores(model)) == scores(exp12))
    } finally q1.stop()
    drop(d3) // lands while the maintainer is DOWN
    val q2 = start()
    try awaitArtifact(q2, "down-time batch picked up on restart")(
      tryRows(scores(model)) == scores(exp123))
    finally q2.stop()
  }

  test("minhashMaintainStream: landed document batches keep the stored " +
    "near-dup index current across a restart; compactEvery bounds the " +
    "signature window; the final screen equals the one-shot build") {
    val dir = tmp("mh_feed")
    val index = tmp("mh_index") + "/mh"
    val ckpt = tmp("mh_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    def seg(id: Long, tok: String) =
      (id, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5 ${tok}6")
    val s1 = Seq(seg(2L, "w"))
    val s2 = Seq(seg(4L, "x"))
    val s3 = Seq(seg(6L, "y"))
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6"),
      (13L, "x1 x2 x3 x4 x5 x6"), (15L, "y1 y2 y3 y4 y5 y6"))
      .toDF("doc_id", "text")
    def flags(path: String): Set[Seq[Any]] =
      graft.pipeline.DedupOps.nearDupAgainstStoredIndex(spark, path,
          batch, "text", "doc_id", 0.5)
        .collect().map(_.toSeq).toSet
    def start() = PipelineStreams.minhashMaintainStream(
      spark.readStream.schema(docSchema).parquet(dir),
      index, ckpt, "text", "doc_id", compactEvery = 2)
    val exp12 = tmp("mh_e12") + "/mh"
    val exp123 = tmp("mh_e123") + "/mh"
    graft.pipeline.DedupOps.writeMinhashIndex(
      (s1 ++ s2).toDF("doc_id", "text"), "text", "doc_id", exp12)
    graft.pipeline.DedupOps.writeMinhashIndex(
      (s1 ++ s2 ++ s3).toDF("doc_id", "text"), "text", "doc_id", exp123)
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first segment signed")(
        tryRows(flags(index)).nonEmpty)
      drop(s2) // lands mid-flight
      awaitArtifact(q1, "second segment appended")(
        tryRows(flags(index)) == flags(exp12))
    } finally q1.stop()
    drop(s3) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time segment picked up on restart")(
        tryRows(flags(index)) == flags(exp123))
      // window bound awaited WHILE THE STREAM RUNS — compaction is
      // post-commit, so a stop() right after the screen matches can
      // interrupt it (caught by design) and leave the window one over
      awaitArtifact(q2, "compactEvery bounds the signature window")(
        try {
          val m = graft.pipeline.DedupOps.readMinhashIndexMeta(spark,
            index)
          m.epoch - m.sigBase + 1 <= 2
        } catch { case _: IllegalStateException => false })
    } finally q2.stop()
    assert(flags(index).map(_.head) == Set(11L, 13L, 15L))
    assert(PipelineStreams.compactionFailuresFor(index) === 0L,
      "a healthy minhash maintainer must report zero failures")
  }

  test("digestMaintainStream: landed document batches keep the stored " +
    "exact-digest index current across a restart; compactEvery bounds " +
    "the digest window; the final dedup equals the one-shot build; a " +
    "batch relation is refused") {
    val dir = tmp("dg_feed")
    val index = tmp("dg_index") + "/dg"
    val ckpt = tmp("dg_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    val s1 = Seq((0L, "alpha"), (1L, "beta"))
    val s2 = Seq((2L, "gamma"))
    val s3 = Seq((3L, "delta"))
    val batch = Seq((10L, "alpha"), (11L, "gamma"), (12L, "delta"),
      (13L, "epsilon"), (14L, "epsilon")).toDF("doc_id", "text")
    def survivors(path: String): Set[Seq[Any]] =
      graft.pipeline.DedupOps.dedupExactAgainstStoredIndex(spark, path,
          batch, "text", "doc_id")
        .select("doc_id").collect().map(_.toSeq).toSet
    def start() = PipelineStreams.digestMaintainStream(
      spark.readStream.schema(docSchema).parquet(dir),
      index, ckpt, "text", compactEvery = 2)
    // a non-streaming relation must be refused before start()
    intercept[IllegalArgumentException] {
      PipelineStreams.digestMaintainStream(
        s1.toDF("doc_id", "text"), index, ckpt, "text")
    }
    val exp12 = tmp("dg_e12") + "/dg"
    val exp123 = tmp("dg_e123") + "/dg"
    graft.pipeline.DedupOps.writeDigestIndex(
      (s1 ++ s2).toDF("doc_id", "text"), "text", exp12)
    graft.pipeline.DedupOps.writeDigestIndex(
      (s1 ++ s2 ++ s3).toDF("doc_id", "text"), "text", exp123)
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first batch folded")(
        tryRows(survivors(index)).nonEmpty)
      drop(s2) // lands mid-flight
      awaitArtifact(q1, "second batch folded")(
        tryRows(survivors(index)) == survivors(exp12))
    } finally q1.stop()
    drop(s3) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time batch picked up on restart")(
        tryRows(survivors(index)) == survivors(exp123))
      // window bound awaited while the stream runs (the post-commit
      // compaction / stop() race — see the minhash leg)
      awaitArtifact(q2, "compactEvery bounds the digest window")(
        try {
          val m = graft.pipeline.DedupOps.readDigestIndexMeta(spark,
            index)
          m.epoch - m.digestBase + 1 <= 2
        } catch { case _: IllegalStateException => false })
    } finally q2.stop()
    // 10/11/12 are stored dups; 13/14 share novel content, 13 survives
    assert(survivors(index).map(_.head) == Set(13L))
    assert(PipelineStreams.compactionFailuresFor(index) === 0L,
      "a healthy digest maintainer must report zero failures")
  }

  test("admissionMaintainStream: arriving batches admit against the " +
    "loop's own growing digest store, across a restart; compactEvery " +
    "bounds the store's window; a batch relation is refused") {
    val dir = tmp("ad_feed")
    val out = tmp("ad_out")
    val dg = tmp("ad_dg") + "/dg"
    val ckpt = tmp("ad_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    def start() = PipelineStreams.admissionMaintainStream(
      spark.readStream.schema(docSchema).parquet(dir),
      out, dg, ckpt, "text", "doc_id", compactEvery = 2)
    intercept[IllegalArgumentException] {
      PipelineStreams.admissionMaintainStream(
        Seq((0L, "x")).toDF("doc_id", "text"), out, dg, ckpt,
        "text", "doc_id")
    }
    def admittedIds(): Set[Long] = landedDocIds(out)
    drop(Seq((1L, "alpha"), (3L, "beta"), (5L, "alpha"))) // 5 in-batch dup
    val q1 = start()
    try {
      awaitArtifact(q1, "first batch admitted")(
        admittedIds() == Set(1L, 3L))
      drop(Seq((7L, "alpha"), (9L, "gamma"))) // 7 dups an admitted doc
      awaitArtifact(q1, "second batch screened against the store")(
        admittedIds() == Set(1L, 3L, 9L))
    } finally q1.stop()
    drop(Seq((11L, "gamma"), (13L, "delta"))) // lands while DOWN
    def storeCount(): Long =
      storeMeta(dg).map(_.digestCount).getOrElse(-1L)
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time batch picked up on restart")(
        admittedIds() == Set(1L, 3L, 9L, 13L))
      // the landing dir commits BEFORE the digest ingest (the loop's
      // crash-window order) — wait for the store commit too, or the
      // stop() below aborts it mid-flight
      awaitArtifact(q2, "down-time batch's digests folded")(
        storeCount() == 4L)
      // window bound awaited while the stream runs (the post-commit
      // compaction / stop() race — see the minhash leg)
      awaitArtifact(q2, "compactEvery bounds the loop's digest window")(
        try {
          val m = graft.pipeline.DedupOps.readDigestIndexMeta(spark, dg)
          m.epoch - m.digestBase + 1 <= 2
        } catch { case _: IllegalStateException => false })
    } finally q2.stop()
    // the loop's store covers exactly the admitted corpus
    val m = graft.pipeline.DedupOps.readDigestIndexMeta(spark, dg)
    assert(m.digestCount == 4L, s"alpha/beta/gamma/delta, meta was $m")
    assert(PipelineStreams.compactionFailuresFor(dg) === 0L,
      "a healthy admission loop must report zero failures")
  }

  test("crawl -> text -> admit, end to end: warcTextStream feeds " +
    "admissionMaintainStream; a re-crawled page (same bytes, new " +
    "filename) is rejected by the loop's own store") {
    val land = tmp("ca_land")
    val out = tmp("ca_out")
    val dg = tmp("ca_dg") + "/dg"
    val ckpt = tmp("ca_ckpt")
    def warcBytes(id: Long) = graft.pipeline.WarcOps
      .encodeSyntheticWarcGz(Seq(id).toDF("id"), "id")
    def dropAs(content: org.apache.spark.sql.DataFrame, name: Long): Unit =
      graft.sources.TableSources.writeBinaryDir(
        content.withColumn("media_id", lit(name)),
        land, "media_id", "content", ".warc.gz")
    // the caller-shaped seam: crawl tap -> (doc_id, text) relation
    val docsStream = PipelineStreams.warcTextStream(spark, land)
      .select((col("media_id") * 100 + col("record_idx")).as("doc_id"),
        col("text"))
    def start() = PipelineStreams.admissionMaintainStream(
      docsStream, out, dg, ckpt, "text", "doc_id")
    def admittedCount(): Long = landedDocIds(out).size.toLong
    // file 0: 3 responses, r=0 is the 404 -> 2 training docs
    dropAs(warcBytes(0L), 0L)
    val q1 = start()
    try {
      awaitArtifact(q1, "first crawl segment admitted")(
        admittedCount() == 2L)
      // file 1: 4 responses, all 200 -> 4 novel docs
      dropAs(warcBytes(1L), 1L)
      awaitArtifact(q1, "second segment admitted")(admittedCount() == 6L)
      // the RE-CRAWL: file 0's exact bytes land again under a new
      // filename — new doc_ids, byte-identical pages. The loop's own
      // digest store must reject every one of them.
      dropAs(warcBytes(0L), 10L)
      def lastBatch(): Long =
        storeMeta(dg).map(_.lastBatchId).getOrElse(-1L)
      awaitArtifact(q1, "re-crawled segment processed")(lastBatch() >= 2L)
      assert(admittedCount() == 6L,
        "byte-identical re-crawled pages must all reject as exact_dup")
      // and the store covers exactly the admitted corpus
      assert(graft.pipeline.DedupOps.readDigestIndexMeta(spark, dg)
        .digestCount == 6L)
    } finally q1.stop()
  }

  test("decontamMaintainStream: landed benchmark suites keep the " +
    "stored index current across a restart; the final screen equals " +
    "the one-shot build") {
    val dir = tmp("dc_feed")
    val index = tmp("dc_index") + "/dc"
    val ckpt = tmp("dc_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("bench_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    def suite(id: Long, tok: String) =
      (id, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5")
    val s1 = Seq(suite(100L, "w"))
    val s2 = Seq(suite(200L, "x"))
    val s3 = Seq(suite(300L, "y"))
    val train = Seq(
      (1L, "w1 w2 w3 w4 w5 extra"),
      (2L, "x1 x2 x3 x4 x5 extra"),
      (3L, "y1 y2 y3 y4 y5 extra"),
      (4L, "q1 q2 q3 q4 q5 clean")).toDF("doc_id", "text")
    def flags(path: String): Set[Seq[Any]] =
      TextOps.screenAgainstStoredDecontam(spark, path, train, "text",
          "doc_id", minOverlap = 2L)
        .collect().map(_.toSeq).toSet
    val benchSchema = StructType(Seq(
      StructField("bench_id", LongType), StructField("text", StringType)))
    def start() = PipelineStreams.decontamMaintainStream(
      spark.readStream.schema(benchSchema).parquet(dir),
      index, ckpt, "text", "bench_id", shingleK = 3)
    val exp12 = tmp("dc_e12") + "/dc"
    val exp123 = tmp("dc_e123") + "/dc"
    TextOps.writeDecontamIndex((s1 ++ s2).toDF("bench_id", "text"),
      "text", "bench_id", exp12, shingleK = 3)
    TextOps.writeDecontamIndex((s1 ++ s2 ++ s3).toDF("bench_id", "text"),
      "text", "bench_id", exp123, shingleK = 3)
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first suite folded")(
        tryRows(flags(index)).nonEmpty)
      drop(s2) // a new benchmark adopted mid-flight
      awaitArtifact(q1, "second suite folded")(
        tryRows(flags(index)) == flags(exp12))
    } finally q1.stop()
    drop(s3) // adopted while the maintainer is DOWN
    val q2 = start()
    try awaitArtifact(q2, "down-time suite picked up on restart")(
      tryRows(flags(index)) == flags(exp123))
    finally q2.stop()
    // and the final screen flags exactly the three overlapping docs
    assert(flags(index).map(_.head) == Set(1L, 2L, 3L))
  }

  test("retrievalMaintainStream: landed document batches keep the " +
    "stored retrieval index current across a restart; compactEvery " +
    "bounds the postings window; final probes equal the one-shot " +
    "build; a batch relation is refused") {
    val dir = tmp("rt_feed")
    val index = tmp("rt_index") + "/rt"
    val ckpt = tmp("rt_ckpt")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    val s1 = Seq((0L, "spark query engine"), (1L, "query planner rules"))
    val s2 = Seq((2L, "vector search engine"))
    val s3 = Seq((3L, "spark vector join"))
    val workload = Seq((100L, "spark engine"), (101L, "vector"))
      .toDF("query_id", "query_text")
    def probes(path: String): Set[Seq[Any]] =
      graft.pipeline.RetrievalOps.bm25AgainstStoredIndex(spark, path,
          workload, "query_id", "query_text", 3)
        .collect().map(_.toSeq).toSet
    def start() = PipelineStreams.retrievalMaintainStream(
      spark.readStream.schema(docSchema).parquet(dir),
      index, ckpt, "text", "doc_id", compactEvery = 2)
    intercept[IllegalArgumentException] {
      PipelineStreams.retrievalMaintainStream(
        s1.toDF("doc_id", "text"), index, ckpt, "text", "doc_id")
    }
    val exp12 = tmp("rt_e12") + "/rt"
    val exp123 = tmp("rt_e123") + "/rt"
    graft.pipeline.RetrievalOps.writeRetrievalIndex(
      (s1 ++ s2).toDF("doc_id", "text"), "text", "doc_id", exp12)
    graft.pipeline.RetrievalOps.writeRetrievalIndex(
      (s1 ++ s2 ++ s3).toDF("doc_id", "text"), "text", "doc_id", exp123)
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first segment indexed")(
        tryRows(probes(index)).nonEmpty)
      drop(s2) // lands mid-flight
      awaitArtifact(q1, "second segment appended")(
        tryRows(probes(index)) == probes(exp12))
    } finally q1.stop()
    drop(s3) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time segment picked up on restart")(
        tryRows(probes(index)) == probes(exp123))
      // await the bound WHILE THE STREAM RUNS: compaction is
      // post-commit, so stopping right after the probe matches can
      // interrupt it mid-flight (caught by design — it must not fail
      // the committed batch) and leave the window one over until the
      // next batch
      awaitArtifact(q2, "compactEvery bounds the postings window")(
        try {
          val m = graft.pipeline.RetrievalOps.readRetrievalIndexMeta(
            spark, index)
          m.epoch - m.base + 1 <= 2
        } catch { case _: IllegalStateException => false })
    } finally q2.stop()
    assert(PipelineStreams.compactionFailuresFor(index) === 0L,
      "a healthy retrieval maintainer must report zero failures")
  }

  test("hostGraphMaintainStream: landed edge batches keep the stored " +
    "host graph current across a restart (exactly-once sums); " +
    "compactEvery bounds the window; final graph equals the one-shot " +
    "sum; a batch relation is refused") {
    val edgeSchema = StructType(Seq(
      StructField("src", StringType), StructField("dst", StringType),
      StructField("w", LongType)))
    val dir = tmp("lg_feed")
    val index = tmp("lg_index") + "/g"
    val ckpt = tmp("lg_ckpt")
    def drop(rows: Seq[(String, String, Long)]): Unit =
      rows.toDF("src", "dst", "w").coalesce(1)
        .write.mode("append").parquet(dir)
    val s1 = Seq(("a", "b", 3L), ("b", "c", 2L))
    val s2 = Seq(("a", "b", 1L), ("c", "a", 4L))
    val s3 = Seq(("a", "d", 5L))
    def graph(): Set[Seq[Any]] = tryRows {
      graft.pipeline.LinkGraphOps.readStoredHostGraph(spark, index)
        .collect().map(_.toSeq).toSet
    }
    def expect(slices: Seq[(String, String, Long)]*): Set[Seq[Any]] =
      slices.flatten.groupBy(e => (e._1, e._2))
        .map { case ((s, t), es) =>
          Seq[Any](s, t, es.map(_._3).sum) }.toSet
    def start() = PipelineStreams.hostGraphMaintainStream(
      spark.readStream.schema(edgeSchema).parquet(dir),
      index, ckpt, "src", "dst", "w", compactEvery = 2)
    intercept[IllegalArgumentException] {
      PipelineStreams.hostGraphMaintainStream(
        s1.toDF("src", "dst", "w"), index, ckpt, "src", "dst", "w")
    }
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first edge batch folded")(graph() == expect(s1))
      drop(s2)
      awaitArtifact(q1, "second batch summed in")(
        graph() == expect(s1, s2))
    } finally q1.stop()
    drop(s3) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time batch picked up on restart")(
        graph() == expect(s1, s2, s3))
      // the bound is awaited while the stream runs — stop() right
      // after the graph matches can interrupt the post-commit
      // compaction (caught by design), leaving the window one over
      // until the next batch
      awaitArtifact(q2, "compactEvery bounds the edge window")(
        try {
          val m = graft.pipeline.LinkGraphOps.readHostGraphMeta(spark,
            index)
          m.epoch - m.base + 1 <= 2
        } catch { case _: IllegalStateException => false })
    } finally q2.stop()
    val m = graft.pipeline.LinkGraphOps.readHostGraphMeta(spark, index)
    assert(m.totalW === (s1 ++ s2 ++ s3).map(_._3).sum,
      "total weight must be the exactly-once sum")
    assert(PipelineStreams.hostGraphCompactionFailures(index) === 0L,
      "a healthy maintainer must report zero consecutive failures")
  }

  test("compaction-failure counter: consecutive failures count up, a " +
    "success resets to zero, paths are isolated") {
    val pA = "/tmp/graft_cfc_a"
    val pB = "/tmp/graft_cfc_b"
    assert(PipelineStreams.hostGraphCompactionFailures(pA) === 0L)
    PipelineStreams.recordCompactionResult(pA, failed = true)
    PipelineStreams.recordCompactionResult(pA, failed = true)
    assert(PipelineStreams.hostGraphCompactionFailures(pA) === 2L)
    assert(PipelineStreams.hostGraphCompactionFailures(pB) === 0L,
      "another path's counter must be untouched")
    PipelineStreams.recordCompactionResult(pA, failed = false)
    assert(PipelineStreams.hostGraphCompactionFailures(pA) === 0L,
      "a successful compaction check resets the streak")
    // the generic accessor is the same counter (one map, keyed by path)
    PipelineStreams.recordCompactionResult(pB, failed = true)
    assert(PipelineStreams.compactionFailuresFor(pB) === 1L &&
      PipelineStreams.hostGraphCompactionFailures(pB) === 1L)
    PipelineStreams.recordCompactionResult(pB, failed = false)
    // SHUTDOWN CANCELLATION is not a health failure: stop() racing an
    // in-flight post-commit compaction cancels its job group, and that
    // signature must leave the streak untouched (a phantom consecutive
    // failure here is exactly what the counter exists to NOT cry wolf
    // about) — the classifier walks the cause chain like MetaIO does
    val cancelled = new org.apache.spark.SparkException(
      "Job 7 cancelled Query [id = x, runId = y] was stopped")
    assert(PipelineStreams.isStopCancellation(cancelled),
      "a job-group cancellation from stop() must classify as shutdown")
    assert(PipelineStreams.isStopCancellation(
      new RuntimeException("wrapped", cancelled)),
      "the signature must be found through a cause chain")
    assert(PipelineStreams.isStopCancellation(new InterruptedException()),
      "a bare interrupt of the blocked action is the same shutdown")
    assert(!PipelineStreams.isStopCancellation(
      new org.apache.spark.SparkException("FAILED_READ_FILE at part-0")),
      "a genuine compaction failure must still count")
  }

  test("crawl -> graph, end to end: landed .warc.gz files keep the " +
    "stored host graph current across a restart, and served ranks " +
    "equal the one-shot batch chain over the same files") {
    val land = tmp("cg_land")
    val index = tmp("cg_index") + "/g"
    val ckpt = tmp("cg_ckpt")
    def dropAs(id: Long, name: Long): Unit =
      graft.sources.TableSources.writeBinaryDir(
        graft.pipeline.WarcOps
          .encodeSyntheticWarcGzLinked(Seq(id).toDF("id"), "id")
          .withColumn("media_id", lit(name)),
        land, "media_id", "content", ".warc.gz")
    def graph(): Set[Seq[Any]] = tryRows {
      graft.pipeline.LinkGraphOps.readStoredHostGraph(spark, index)
        .collect().map(_.toSeq).toSet
    }
    /** The audited one-shot batch chain over file ids. */
    def expect(ids: Seq[Long]): Set[Seq[Any]] = {
      val pages = graft.pipeline.WarcOps.warcRecordsGz(
          graft.pipeline.WarcOps.encodeSyntheticWarcGzLinked(
            ids.toDF("id"), "id"), "content", "media_id")
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200)
        .select(col("target_uri").as("page_uri"), col("body").as("html"))
      graft.pipeline.LinkGraphOps.hostGraph(
          graft.pipeline.LinkGraphOps.extractLinks(pages, "page_uri",
            "html"), "src_uri", "dst_uri")
        .collect().map(_.toSeq).toSet
    }
    def start() = PipelineStreams.crawlGraphMaintainStream(
      spark, land, index, ckpt, compactEvery = 2)
    dropAs(3L, 0L)
    val q1 = start()
    try {
      awaitArtifact(q1, "first crawl file folded")(
        graph() == expect(Seq(3L)))
      dropAs(12L, 1L) // different host (12 % 7 = 5), lands mid-flight
      awaitArtifact(q1, "second file's edges summed in")(
        graph() == expect(Seq(3L, 12L)))
    } finally q1.stop()
    dropAs(26L, 2L) // lands while the maintainer is DOWN
    val q2 = start()
    try awaitArtifact(q2, "down-time file picked up on restart")(
      graph() == expect(Seq(3L, 12L, 26L)))
    finally q2.stop()
    // ranks off the maintained store ≡ ranks over the one-shot graph
    val served = graft.pipeline.LinkGraphOps.pageRankStoredGraph(
        spark, index, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = graft.pipeline.LinkGraphOps.pageRankHosts(
        expect(Seq(3L, 12L, 26L)).toSeq
          .map(s => (s(0).asInstanceOf[String], s(1).asInstanceOf[String],
            s(2).asInstanceOf[Long]))
          .toDF("src", "dst", "w"), "src", "dst", "w", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served === oneShot,
      "the maintained graph must rank exactly like the batch chain")
  }

  test("cmsMaintainStream: landed item batches keep the stored frequency " +
    "sketch current across a restart; estimates stay EXACTLY equal to " +
    "the one-shot sketch (a replayed batch that double-counted would " +
    "overshoot); the footprint stays at the grace pair of epochs; " +
    "batch relations and bad geometry are refused before start") {
    val dir = tmp("cms_feed")
    val index = tmp("cms_index") + "/cms"
    val ckpt = tmp("cms_ckpt")
    val itemSchema = StructType(Seq(
      StructField("g", StringType), StructField("v", StringType)))
    def drop(rows: Seq[(String, String)]): Unit =
      rows.toDF("g", "v").coalesce(1).write.mode("append").parquet(dir)
    // skewed keyspaces so the tight width=64 geometry forces real
    // collisions — equality below is still exact because the stored
    // and one-shot sketches share the pinned hash family
    val s1 = Seq.tabulate(40)(i => ("a", s"k${i % 5}"))
    val s2 = Seq.tabulate(30)(i => ("a", s"k${i % 3}")) :+ (("b", "x"))
    val s3 = Seq.tabulate(20)(i => ("b", s"k${i % 4}"))
    // one fixed probe relation for every comparison: items a slice has
    // not folded yet estimate 0 on BOTH sides, so equality covers the
    // unseen-item contract too
    val probes = (s1 ++ s2 ++ s3).distinct.toDF("g", "v")
    def oneShot(rows: Seq[(String, String)]): Set[(String, String, Long)] =
      graft.pipeline.StatsOps.cmsEstimate(
          graft.pipeline.StatsOps.cmsCells(rows.toDF("g", "v"), Seq("g"),
            col("v"), 2, 64),
          probes, Seq("g"), "v", 2, 64)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    def stored(): Set[(String, String, Long)] = try {
      graft.pipeline.StatsOps.estimateFromStoredCms(spark, index, probes,
          "v")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    } catch {
      case _: IllegalStateException => Set.empty
      case _: org.apache.spark.SparkException => Set.empty
    }
    def start() = PipelineStreams.cmsMaintainStream(
      spark.readStream.schema(itemSchema).parquet(dir),
      index, ckpt, Seq("g"), "v", depth = 2, width = 64)
    // pre-start refusals: a batch relation, bad geometry, a feed
    // missing the named columns — each before any query exists
    intercept[IllegalArgumentException] {
      PipelineStreams.cmsMaintainStream(
        s1.toDF("g", "v"), index, ckpt, Seq("g"), "v")
    }
    intercept[IllegalArgumentException] {
      PipelineStreams.cmsMaintainStream(
        spark.readStream.schema(itemSchema).parquet(dir),
        index, ckpt, Seq("g"), "v", depth = 0, width = 64)
    }
    intercept[IllegalArgumentException] {
      PipelineStreams.cmsMaintainStream(
        spark.readStream.schema(itemSchema).parquet(dir),
        index, ckpt, Seq("g"), "nope")
    }
    drop(s1)
    val q1 = start()
    try {
      awaitArtifact(q1, "first batch built the sketch")(
        stored() == oneShot(s1))
      drop(s2) // lands mid-flight
      awaitArtifact(q1, "second batch folded in")(
        stored() == oneShot(s1 ++ s2))
    } finally q1.stop()
    drop(s3) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitArtifact(q2, "down-time batch picked up on restart")(
        stored() == oneShot(s1 ++ s2 ++ s3))
    } finally q2.stop()
    // exactly-once, asserted as EQUALITY after the restart path: any
    // replay that re-folded a batch would push some estimate ABOVE the
    // one-shot value (cell sums only grow)
    assert(stored() == oneShot(s1 ++ s2 ++ s3))
    // geometry pinned by the first build, epochs advanced per applied
    // batch, footprint bounded at the grace pair (no compaction knob
    // exists because no delta window exists)
    val meta = graft.pipeline.StatsOps.readCmsIndexMeta(spark, index)
    assert(meta.depth == 2 && meta.width == 64 &&
      meta.groupCols == Seq("g"))
    assert(meta.lastBatchId >= 0L,
      "the applied-batch pointer must have advanced")
    val epochDirs = Option(new java.io.File(s"$index/cells").listFiles())
      .toSeq.flatten.filter(_.getName.startsWith("e")).map(_.getName)
    assert(epochDirs.toSet.contains(s"e${meta.epoch}") &&
      epochDirs.size <= 2,
      s"cells/ must hold at most the grace pair, got $epochDirs")
  }
}
