package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted media-fingerprint index (eleventh artifact lifecycle):
  * build/append/probe over real encoded images, torn-append isolation,
  * idempotent re-drops, epoch GC, window compaction, the streaming
  * batch discipline, and the undecodable-payload exclusion — the image
  * analogue of the stored MinHash/decontam discipline, pinned the same
  * way. */
class MediaHashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def imgs(ids: Seq[Long]) =
    MultimodalOps.encodeSyntheticPng(ids.toDF("id"), "id")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mhi_$tag").toString

  private def epochs(root: String): Set[String] =
    graft.SpecSupport.epochs(root)

  /** The index's VISIBLE fingerprints — what probes see: the meta
    * window's epoch union, never raw directory contents. */
  private def visibleHashes(dir: String) = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    spark.read.parquet(
      (meta.getAs[Long]("hash_base") to meta.getAs[Long]("epoch"))
        .map(e => s"$dir/hashes/e$e"): _*)
  }

  /** Data files across the visible window — the compaction yardstick. */
  private def visibleDataFiles(dir: String): Int = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    (meta.getAs[Long]("hash_base") to meta.getAs[Long]("epoch")).map { e =>
      Option(new java.io.File(s"$dir/hashes/e$e").listFiles()).toSeq.flatten
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    }.sum
  }

  test("build + append + probe: exact copies rediscover their stored " +
    "originals; novel images match nothing; re-append is a no-op; " +
    "derived epochs keep {current, superseded}") {
    val dir = tmp("life")
    MultimodalOps.writeMediaHashIndex(imgs(Seq(0L, 2L, 4L)),
      "content", "media_id", dir, bands = 2)
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(1L, 3L)),
      "content", "media_id")
    // ground truth from the in-memory pair join over the SAME hashes
    val allHashes = MultimodalOps.imageAHash(
      imgs(Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L)), "content", "media_id")
    val truth = MultimodalOps.ahashPairs(allHashes, "media_id",
        maxHamming = 1, bands = 2)
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(1), r.getLong(0), r.getLong(2))))
      .filter { case (_, m, _) => m <= 4L } // stored side is 0..4
      .toSet ++
      // self-matches: a probe re-presenting a stored id matches itself
      Seq(0L, 1L, 2L, 3L, 4L).map(i => (i, i, 0L)).toSet
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L)), "content", "media_id",
        maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth)
    assert(got.exists { case (p, m, h) => p == m && h == 0L },
      "exact copies must rediscover their originals")
    // novel-image probes that truly have no <=1 neighbour match nothing
    val novelMatches = got.filter(t => t._1 == 100L || t._1 == 101L)
    val novelTruth = truth.filter(t => t._1 == 100L || t._1 == 101L)
    assert(novelMatches == novelTruth)
    // idempotent re-drop: the whole corpus re-appends, nothing changes
    val before = visibleHashes(dir).count()
    MultimodalOps.appendMediaHashIndex(spark, dir,
      imgs(Seq(0L, 1L, 2L, 3L, 4L)), "content", "media_id")
    assert(visibleHashes(dir).count() == before,
      "a re-dropped segment must append zero fingerprints")
    assert(MultimodalOps.probeMediaHashIndex(spark, dir,
      imgs(Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L)), "content", "media_id",
      maxHamming = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == truth)
    // epoch GC: two appends later only {current, superseded} remain
    assert(epochs(s"$dir/derived") == Set("e1", "e2"),
      s"got ${epochs(s"$dir/derived")}")
  }

  test("a torn append's orphan epoch is invisible to probes; the " +
    "retried append replaces it wholesale — landed exactly once") {
    val dir = tmp("torn")
    MultimodalOps.writeMediaHashIndex(imgs(Seq(0L, 1L)),
      "content", "media_id", dir, bands = 2)
    // simulate the torn append: segment B's delta epoch dir landed,
    // the derived epoch + meta swap never ran (the crash window)
    MultimodalOps.imageAHash(imgs(Seq(7L)), "content", "media_id")
      .select(col("media_id").as("id"), col("ahash_a"), col("ahash_b"))
      .write.mode("overwrite").parquet(s"$dir/hashes/e1")
    // the orphan sits OUTSIDE the meta window — probes never see it
    // (the flat-append layout this replaced surfaced orphans silently)
    assert(MultimodalOps.probeMediaHashIndex(spark, dir, imgs(Seq(7L)),
      "content", "media_id", maxHamming = 0).count() == 0L,
      "an unswapped epoch must be invisible")
    assert(visibleHashes(dir).count() == 2L)
    // the orchestrator retries segment B: the retry lands on the same
    // epoch number, overwrites the orphan dir wholesale, and commits
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(7L)),
      "content", "media_id")
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 7L)), "content", "media_id", maxHamming = 0)
      .filter(col("probe_id") === col("match_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 7L))
    assert(visibleHashes(dir).count() == 3L,
      "the retried segment must land exactly once")
    assert(visibleHashes(dir).filter(col("id") === 7L).count() == 1L)
  }

  test("streaming batch discipline: first batch builds, later batches " +
    "append, a replayed batch id commits nothing byte for byte, an id " +
    "regressing further than the replay window refuses loudly") {
    val dir = tmp("batch")
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(0L, 1L)), "content", "media_id", batchId = 0L),
      "the first batch must build the artifact")
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(2L)), "content", "media_id", batchId = 1L))
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(3L)), "content", "media_id", batchId = 2L))
    val metaAfter = spark.read.parquet(s"$dir/meta").collect()(0).toSeq
    val hashesAfter = visibleHashes(dir).count()
    assert(!MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(3L)), "content", "media_id", batchId = 2L),
      "a replayed batch id must be skipped")
    assert(!MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(3L)), "content", "media_id", batchId = 1L),
      "an id one below the pointer is still the crash-replay signature")
    assert(spark.read.parquet(s"$dir/meta").collect()(0).toSeq == metaAfter
      && visibleHashes(dir).count() == hashesAfter,
      "the replay must leave the artifact byte-identical")
    // an id regressing MORE than one below the pointer is a reset
    // checkpoint or second writer — dropped data, so it throws and
    // names the backfill instead of skipping quietly
    val err = intercept[IllegalArgumentException] {
      MultimodalOps.ingestMediaHashBatch(spark, dir,
        imgs(Seq(9L)), "content", "media_id", batchId = 0L)
    }
    assert(err.getMessage.contains("appendMediaHashIndex") &&
      err.getMessage.contains("regressed"))
    // and the maintained artifact probes like a one-shot build
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 2L, 3L)), "content", "media_id", maxHamming = 0)
      .filter(col("probe_id") === col("match_id")).count()
    assert(got == 4L)
  }

  test("compaction: build -> N appends -> compact leaves probe output " +
    "byte-identical, re-bases the window onto one file-set, and the " +
    "next compaction's janitor prunes the superseded generation") {
    val dir = tmp("compact")
    MultimodalOps.writeMediaHashIndex(imgs(Seq(0L, 1L)),
      "content", "media_id", dir, bands = 2)
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(2L, 3L)),
      "content", "media_id")
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(4L)),
      "content", "media_id")
    val probeIds = Seq(0L, 1L, 2L, 3L, 4L, 100L)
    def probe() = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(probeIds), "content", "media_id", maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = probe()
    val filesBefore = visibleDataFiles(dir)
    assert(epochs(s"$dir/hashes") == Set("e0", "e1", "e2"),
      "one hash epoch dir per commit before compaction")
    // below the policy threshold nothing happens...
    assert(!MultimodalOps.maybeCompactMediaHashIndex(spark, dir, 4))
    // ...at it, the window compacts
    assert(MultimodalOps.maybeCompactMediaHashIndex(spark, dir, 3))
    val metaRow = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(metaRow.getAs[Long]("epoch") == 3L &&
      metaRow.getAs[Long]("hash_base") == 3L &&
      metaRow.getAs[Long]("hash_count") == 5L)
    assert(probe() == before, "compaction must not change probe output")
    assert(visibleDataFiles(dir) == 1,
      s"the visible window must be one file-set, was $filesBefore files")
    // the superseded generation gets ONE compaction's grace (a racing
    // probe that resolved the old meta still reads its window)...
    assert(epochs(s"$dir/hashes") == Set("e0", "e1", "e2", "e3"))
    // ...and the NEXT compaction's janitor prunes below the old base
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(5L)),
      "content", "media_id")
    MultimodalOps.compactMediaHashIndex(spark, dir)
    assert(epochs(s"$dir/hashes") == Set("e3", "e4", "e5"),
      s"got ${epochs(s"$dir/hashes")}")
    assert(probe().subsetOf(
      MultimodalOps.probeMediaHashIndex(spark, dir, imgs(probeIds),
        "content", "media_id", maxHamming = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet))
  }

  test("maintenance stream: landed PNG segments keep the stored " +
    "fingerprint index current, including across a restart, and " +
    "compactEvery bounds the epoch window") {
    val dir = tmp("live")
    val ckpt = tmp("live_c")
    val idx = tmp("live_i") + "/mh"
    def dropImgs(ids: Seq[Long]): Unit =
      graft.sources.TableSources.writeBinaryDir(
        imgs(ids), dir, "media_id", "content", ".png")
    def start() = graft.streaming.PipelineStreams
      .mediaHashMaintainStream(spark, dir, idx, ckpt, compactEvery = 2)
    def selfMatches(ids: Seq[Long]): Set[Long] =
      try MultimodalOps.probeMediaHashIndex(spark, idx, imgs(ids),
          "content", "media_id", maxHamming = 0)
        .filter(col("probe_id") === col("match_id"))
        .collect().map(_.getLong(0)).toSet
      catch {
        case _: IllegalStateException => Set.empty[Long] // no meta yet
        case _: org.apache.spark.SparkException => Set.empty[Long] // swap race
      }
    def awaitIdx(q: org.apache.spark.sql.streaming.StreamingQuery,
                 label: String)(pred: => Boolean): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!pred && System.nanoTime() < deadline) {
        q.exception.foreach(e => throw e)
        Thread.sleep(100)
      }
      assert(pred, s"timed out waiting for: $label")
    }
    dropImgs(Seq(0L, 1L))
    val q1 = start()
    try {
      awaitIdx(q1, "first segment fingerprinted")(
        selfMatches(Seq(0L, 1L)) == Set(0L, 1L))
      dropImgs(Seq(2L)) // lands mid-flight
      awaitIdx(q1, "second segment appended")(
        selfMatches(Seq(0L, 1L, 2L)) == Set(0L, 1L, 2L))
    } finally q1.stop()
    dropImgs(Seq(3L)) // lands while the maintainer is DOWN
    val q2 = start()
    try {
      awaitIdx(q2, "down-time segment picked up on restart")(
        selfMatches(Seq(0L, 1L, 2L, 3L)) == Set(0L, 1L, 2L, 3L))
      // window bound awaited WHILE THE STREAM RUNS — compaction is
      // post-commit, so a stop() right after the probe matches can
      // interrupt it (caught by design) and leave the window one over:
      // at most {compacted base} + one uncompacted append once it runs
      awaitIdx(q2, "compactEvery bounds the fingerprint window")(
        try {
          val m = spark.read.parquet(s"$idx/meta").collect()(0)
          m.getAs[Long]("epoch") - m.getAs[Long]("hash_base") + 1 <= 2
        } catch { case scala.util.control.NonFatal(_) => false })
    } finally q2.stop()
    assert(graft.streaming.PipelineStreams.compactionFailuresFor(idx) == 0L,
      "a healthy media-hash maintainer must report zero failures")
  }

  test("a swap that died between delete and rename is RECOVERED by the " +
    "next ingest batch; fingerprints without any meta are refused, " +
    "never overwritten; a PARTIAL meta__next is deleted, not promoted") {
    val dir = tmp("swapwin")
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(0L, 1L)), "content", "media_id", batchId = 0L))
    // reproduce the exact crash window: meta deleted, the fully
    // written meta__next never renamed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/meta"),
      new org.apache.hadoop.fs.Path(s"$dir/meta__next")))
    // the next batch must COMPLETE the swap and append — a naive
    // missing-meta check would rebuild with overwrite and wipe the
    // fingerprint relation
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(2L)), "content", "media_id", batchId = 1L))
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 2L)), "content", "media_id", maxHamming = 0)
      .filter(col("probe_id") === col("match_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L),
      s"recovery must keep the pre-crash fingerprints, got $got")
    // an UNMARKED sideways write (crash mid-first-build, or a complete
    // write on a marker-less deployment — indistinguishable) is NOT
    // promoted: promoting a torn one would hand the next ingest an
    // unreadable meta and crash-loop it. It is left IN PLACE for the
    // operator (deleting would destroy a marker-less artifact's only
    // meta) and the loud no-recoverable-meta refusal fires
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta__next"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/meta__next"))
    val partOut = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/meta__next/part-00000-torn.parquet"))
    partOut.write(Array[Byte](1, 2, 3)); partOut.close()
    val errPartial = intercept[IllegalArgumentException] {
      MultimodalOps.ingestMediaHashBatch(spark, dir,
        imgs(Seq(3L)), "content", "media_id", batchId = 2L)
    }
    assert(errPartial.getMessage.contains("refusing"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/meta__next")),
      "an unmarked tmp holding data is left for the operator")
    // beyond the swap window (no meta, no recoverable tmp, data
    // present): refuse loudly instead of rebuilding over the relation
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta__next"), true)
    val err = intercept[IllegalArgumentException] {
      MultimodalOps.ingestMediaHashBatch(spark, dir,
        imgs(Seq(3L)), "content", "media_id", batchId = 2L)
    }
    assert(err.getMessage.contains("refusing"))
  }

  test("bloom capacity WARN: an append pushing past ~numBits/10 keys " +
    "warns loudly; below capacity stays silent") {
    val dir = tmp("satur")
    // 64-bit bloom: capacity = 6 keys at 10 bits/element; 2 bands
    val (_, quiet) = graft.SpecSupport.capturingErr {
      MultimodalOps.writeMediaHashIndex(imgs(Seq(0L, 1L)), "content",
        "media_id", dir, bands = 2, bloomBits = 64)
      MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(2L)),
        "content", "media_id") // 3 images x 2 bands = 6 keys == capacity
    }
    assert(!quiet.contains("design capacity"),
      s"below-capacity appends must stay silent, got: $quiet")
    val (_, loud) = graft.SpecSupport.capturingErr {
      MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(3L)),
        "content", "media_id") // 4 x 2 = 8 keys > 6
    }
    assert(loud.contains("design capacity") && loud.contains(dir),
      s"an over-capacity append must warn, got: $loud")
  }

  test("non-periodic generator: where the formula images repeat " +
    "byte-identically (one period apart), the hash-mixed images differ " +
    "and their fingerprints stay distinct") {
    val period = 16128L // lcm(9, 7, 256): dims AND pixels realign
    val ids = Seq(5L, 5L + period, 5L + 2 * period)
    def bytes(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Array[Byte]]("content").toSeq)
    val formula = bytes(MultimodalOps.encodeSyntheticPng(
      ids.toDF("id"), "id"))
    assert(formula.distinct.size == 1,
      "the formula images must repeat at the period — the soak gotcha " +
        "this generator exists to fix")
    val mixed = bytes(MultimodalOps.encodeSyntheticPngMixed(
      ids.toDF("id"), "id"))
    assert(mixed.distinct.size == 3,
      "hash-mixed images must differ across periods")
    // distinct fingerprints track the id range (300 ids → 300 hashes;
    // the expected accidental collision count is ~300²/2^65 ≈ 0)
    val fp = MultimodalOps.imageAHash(
        MultimodalOps.encodeSyntheticPngMixed(
          spark.range(0, 300).toDF("id"), "id"),
        "content", "media_id")
      .select("ahash_a", "ahash_b").distinct().count()
    assert(fp == 300L, s"expected 300 distinct fingerprints, got $fp")
  }

  test("undecodable payloads are excluded from the index and admitted " +
    "by the dedup filter — stated-plainly semantics") {
    val dir = tmp("undec")
    val garbage = Seq((50L, Array.fill[Byte](32)(0x21)))
      .toDF("media_id", "content")
    MultimodalOps.writeMediaHashIndex(
      imgs(Seq(0L, 1L)).unionByName(garbage), "content", "media_id", dir,
      bands = 2)
    assert(visibleHashes(dir).count() == 2,
      "the undecodable payload must not be fingerprinted")
    val admitted = MultimodalOps.dedupMediaAgainstIndex(spark, dir,
        imgs(Seq(0L, 77L)).unionByName(garbage), "content", "media_id",
        maxHamming = 1)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(0L), "a stored duplicate must be rejected")
    assert(admitted.contains(50L),
      "an undecodable probe matches nothing and is admitted")
    // 77 is admitted unless a genuine <=1 neighbour exists among {0,1}
    val truth77 = MultimodalOps.ahashPairs(
      MultimodalOps.imageAHash(imgs(Seq(0L, 1L, 77L)), "content",
        "media_id"), "media_id", maxHamming = 1, bands = 2)
      .filter(col("id_a") === 77L || col("id_b") === 77L).count() == 0L
    assert(admitted.contains(77L) == truth77)
  }
}
