package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous crawl ingestion: .warc.gz files dropped into a watched
  * directory stream through the SAME record walk as the batch path —
  * two file drops become two micro-batches whose union is exactly the
  * batch walk over the same files, and the text tap applies the
  * q_warc_text chain live. Stateless end to end: no state store, no
  * watermark, files tracked by the source's checkpoint log. */
class WarcIngestStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def awaitSink(query: org.apache.spark.sql.streaming.StreamingQuery,
                        label: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) {
      // fail FAST with the real stack when the query died — polling the
      // sink through the full deadline would bury it in a timeout
      query.exception.foreach(e => throw e)
      Thread.sleep(100)
    }
    assert(pred, s"timed out waiting for: $label")
  }

  private def drop(dir: String, ids: Seq[Long]): Unit =
    graft.sources.TableSources.writeBinaryDir(
      graft.pipeline.WarcOps.encodeSyntheticWarcGz(ids.toDF("id"), "id"),
      dir, "media_id", "content", ".warc.gz")

  test("files landing in the watched dir stream through the record walk; " +
    "batches union to the batch walk over the same files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-live").toString
    drop(dir, Seq(0L, 1L))
    val out = PipelineStreams.warcIngestStream(spark, dir)
    val query = out.writeStream.format("memory").queryName("warc_live")
      .outputMode("append").start()
    def sink = spark.table("warc_live").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      def expect(ids: Seq[Long]) = ids.flatMap(id =>
        (0L to graft.pipeline.WarcOps.synthWarcResponses(id).toLong)
          .map(id -> _)).toSet
      awaitSink(query, "first drop")(sink == expect(Seq(0L, 1L)))
      // a stray filename matching the glob but not the id pattern must
      // be SKIPPED (not wedge the query with a null-id NPE that would
      // replay forever from the checkpoint)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "segment-0001.warc.gz"),
        Array.fill[Byte](16)(0x1F))
      drop(dir, Seq(2L, 3L)) // the second crawl segment lands later
      awaitSink(query, "second drop")(sink == expect(Seq(0L, 1L, 2L, 3L)))
      assert(query.exception.isEmpty,
        "the stray file must not kill the query")
      // the skip is observable: some progress event carries the
      // unidentified_files metric > 0
      val unidentified = query.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("warc_ingest"))
          .map(_.getAs[Long]("unidentified_files"))).sum
      assert(unidentified >= 1L,
        s"the skipped file must be counted in the observed metric")
    } finally query.stop()
    // every column equals the batch walk over the same four files
    val streamed = spark.table("warc_live").collect().map(_.toSeq).toSet
    val batch = graft.pipeline.WarcOps.warcRecordsGz(
      // glob scoped past the stray file; the inline cast here always
      // matches by construction (production batch walks parse ids via
      // the ANSI-safe TableSources.pathId, pinned in TableSourcesSpec)
      graft.sources.TableSources.readBinaryDir(spark, dir, "clip_*.warc.gz")
        .withColumn("media_id", regexp_extract(col("media_path"),
          "clip_(\\d+)\\.warc\\.gz$", 1).cast("long")),
      "content", "media_id").collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("restart recovery: a checkpointed ingest resumes where it stopped — " +
    "already-walked files are not re-emitted, files dropped while down " +
    "are picked up") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-ckpt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-ckpt-c").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-warc-ckpt-o").toString
    // the memory sink cannot recover from a checkpoint — a durable
    // (parquet) sink is the restartable shape, as in StreamRestartSpec
    def start() = PipelineStreams.warcIngestStream(spark, dir)
      .select("media_id", "record_idx")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def sink =
      try spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      catch { // nothing committed yet: schema can't infer from an empty dir
        case _: org.apache.spark.sql.AnalysisException =>
          Array.empty[(Long, Long)]
      }
    def expect(ids: Seq[Long]) = ids.flatMap(id =>
      (0L to graft.pipeline.WarcOps.synthWarcResponses(id).toLong)
        .map(id -> _)).toSet
    drop(dir, Seq(0L, 1L))
    val q1 = start()
    try awaitSink(q1, "pre-restart rows")(sink.toSet == expect(Seq(0L, 1L)))
    finally q1.stop()
    // files land while the query is DOWN; the restart must walk exactly
    // those — a re-walked old file would duplicate its rows in the
    // durable sink
    drop(dir, Seq(2L, 3L))
    val q2 = start()
    try {
      awaitSink(q2, "post-restart rows")(
        sink.toSet == expect(Seq(0L, 1L, 2L, 3L)))
      assert(sink.length == sink.toSet.size,
        "no record may be emitted twice across the restart")
    } finally q2.stop()
  }

  test("index maintenance stream: each landed segment appends to the " +
    "stored CDX artifact; restart walks only new files; the final " +
    "artifact equals the one-shot index") {
    import graft.pipeline.WarcOps
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx-live").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdx-live-c").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-cdx-live-i")
      .toString + "/cdx"
    def files(ids: Seq[Long]) = graft.sources.TableSources
      .listBinaryDir(spark, dir, "*.warc.gz")
      .withColumn("media_id", regexp_extract(col("media_path"),
        "clip_(\\d+)\\.warc\\.gz$", 1).cast("long"))
      .filter(col("media_id").isin(ids: _*))
    def expect(ids: Seq[Long]) = WarcOps.warcMemberIndexRanged(
      files(ids), "media_path", "media_id").collect().map(_.toSeq).toSet
    def readIdx =
      try WarcOps.readWarcIndex(spark, idx).collect().map(_.toSeq).toSet
      catch {
        // no meta yet (first batch hasn't committed)…
        case _: IllegalStateException => Set.empty[Seq[Any]]
        // …or the POLL raced the maintainer's meta swap / epoch commit
        // (delete+rename window): transient by construction — the next
        // poll resolves a consistent snapshot
        case _: org.apache.spark.SparkException => Set.empty[Seq[Any]]
      }
    def start() = PipelineStreams.warcIndexMaintainStream(
      spark, dir, idx, ckpt)

    // a compactEvery the policy would refuse must be rejected BEFORE
    // start() — inside foreachBatch it would crash-loop after commits
    intercept[IllegalArgumentException] {
      PipelineStreams.warcIndexMaintainStream(spark, dir, idx, ckpt,
        compactEvery = 1)
    }
    drop(dir, Seq(0L, 1L))
    val q1 = start()
    try {
      awaitSink(q1, "first segment indexed")(readIdx == expect(Seq(0L, 1L)))
      drop(dir, Seq(2L)) // the next crawl segment lands mid-flight
      awaitSink(q1, "second segment appended")(
        readIdx == expect(Seq(0L, 1L, 2L)))
    } finally q1.stop()
    drop(dir, Seq(3L)) // lands while the maintainer is DOWN
    val q2 = start()
    try awaitSink(q2, "down-time segment picked up on restart")(
      readIdx == expect(Seq(0L, 1L, 2L, 3L)))
    finally q2.stop()
    // the continuously maintained artifact is EXACTLY the one-shot
    // index over the same corpus — same rows, same offsets — and no
    // file was ever walked twice (the walked union holds each id once)
    assert(readIdx == expect(Seq(0L, 1L, 2L, 3L)) && readIdx.nonEmpty)
    val meta = spark.read.parquet(s"$idx/meta").collect()(0)
    assert(PipelineStreams.compactionFailuresFor(idx) === 0L,
      "a healthy warc maintainer must report zero failures")
    val walkedAll = spark.read.parquet(
      (meta.getAs[Long]("base_epoch") to meta.getAs[Long]("epoch"))
        .map(WarcOps.warcIndexWalkedDir(idx, _)): _*).collect()
      .map(_.getLong(0))
    assert(walkedAll.sorted.toSeq == Seq(0L, 1L, 2L, 3L),
      s"each file walked exactly once, got ${walkedAll.toSeq}")
    // and the maintained index serves the ranged fetch like a
    // hand-built one: survivors' records come back exactly
    val survivors = WarcOps.readWarcIndex(spark, idx)
      .filter(col("warc_type") === "response" && col("http_status") === 200)
    val fetched = WarcOps.warcFetchRanged(files(Seq(0L, 1L, 2L, 3L)),
      "media_path", "media_id", survivors).select("media_id", "record_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantFetch = Seq(0L, 1L, 2L, 3L).flatMap(id =>
      (0 until graft.pipeline.WarcOps.synthWarcResponses(id))
        .filter(r => (id + r) % 5 != 0) // the generator's non-200 stripe
        .map(r => (id, r + 1L))).toSet
    assert(fetched == wantFetch)
  }

  test("warc ingest batch discipline: a replay of the stored pointer " +
    "(or one below) skips quietly; an id regressing further refuses " +
    "loudly and names the backfill") {
    import graft.pipeline.WarcOps
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx-guard").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-cdx-guard-i")
      .toString + "/cdx"
    def listed(ids: Seq[Long]) = graft.sources.TableSources
      .listBinaryDir(spark, dir, "*.warc.gz")
      .withColumn("media_id", regexp_extract(col("media_path"),
        "clip_(\\d+)\\.warc\\.gz$", 1).cast("long"))
      .filter(col("media_id").isin(ids: _*))
      .select(col("media_path"), col("media_id"))
    drop(dir, Seq(0L, 1L, 2L))
    assert(WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(0L)),
      "media_path", "media_id", batchId = 0L))
    assert(WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(1L)),
      "media_path", "media_id", batchId = 1L))
    assert(WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(2L)),
      "media_path", "media_id", batchId = 2L))
    val before = WarcOps.readWarcIndex(spark, idx).collect()
      .map(_.toSeq).toSet
    // the crash-replay signature: the replayed batch is always the
    // LAST one started, so ids at or one below the pointer skip quietly
    assert(!WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(2L)),
      "media_path", "media_id", batchId = 2L))
    assert(!WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(2L)),
      "media_path", "media_id", batchId = 1L))
    assert(WarcOps.readWarcIndex(spark, idx).collect()
      .map(_.toSeq).toSet == before,
      "replays must leave the artifact byte-identical")
    // a FURTHER regression is a reset checkpoint or a second writer —
    // silently skipping would lose that batch's files, so it throws
    val err = intercept[IllegalArgumentException] {
      WarcOps.ingestWarcIndexBatch(spark, idx, listed(Seq(0L)),
        "media_path", "media_id", batchId = 0L)
    }
    assert(err.getMessage.contains("appendWarcIndex") &&
      err.getMessage.contains("regressed"))
  }

  test("the text tap applies the q_warc_text chain to the live stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-livet").toString
    drop(dir, Seq(2L, 5L))
    val out = PipelineStreams.warcTextStream(spark, dir)
    val query = out.writeStream.format("memory").queryName("warc_live_text")
      .outputMode("append").start()
    def sink = spark.table("warc_live_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    try {
      val expected = Seq(2L, 5L).flatMap { id =>
        (0 until graft.pipeline.WarcOps.synthWarcResponses(id))
          .filter(r => (id + r) % 5 != 0)
          .map { r =>
            val words = (0 until graft.pipeline.WarcOps.synthWarcWords(id, r))
              .map(k => s"w${id}_${r}_$k").mkString(" ")
            val text = s"t${id}_$r $words & tail"
            (id, r + 1L, text,
              graft.pipeline.WarcOps.synthWarcWords(id, r) + 3L)
          }
      }.toSet
      awaitSink(query, "text rows")(sink == expected)
    } finally query.stop()
  }
}
