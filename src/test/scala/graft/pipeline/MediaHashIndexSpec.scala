package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted media-fingerprint index (eleventh artifact lifecycle):
  * build/append/probe over real encoded images, torn-append self-heal,
  * idempotent re-drops, epoch GC, and the undecodable-payload
  * exclusion — the image analogue of the stored MinHash/decontam
  * discipline, pinned the same way. */
class MediaHashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def imgs(ids: Seq[Long]) =
    MultimodalOps.encodeSyntheticPng(ids.toDF("id"), "id")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mhi_$tag").toString

  private def epochs(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("e")).toSet

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
    val before = spark.read.parquet(s"$dir/hashes").count()
    MultimodalOps.appendMediaHashIndex(spark, dir,
      imgs(Seq(0L, 1L, 2L, 3L, 4L)), "content", "media_id")
    assert(spark.read.parquet(s"$dir/hashes").count() == before,
      "a re-dropped segment must append zero fingerprints")
    assert(MultimodalOps.probeMediaHashIndex(spark, dir,
      imgs(Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L)), "content", "media_id",
      maxHamming = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == truth)
    // epoch GC: two appends later only {current, superseded} remain
    assert(epochs(s"$dir/derived") == Set("e1", "e2"),
      s"got ${epochs(s"$dir/derived")}")
  }

  test("torn append self-heals: orphaned fingerprint rows (landed " +
    "without a meta swap) become probe-visible after the next append") {
    val dir = tmp("torn")
    MultimodalOps.writeMediaHashIndex(imgs(Seq(0L, 1L)),
      "content", "media_id", dir, bands = 2)
    // simulate the torn append: segment B's hashes land, meta never
    // swaps (the crash window between the two commits)
    MultimodalOps.imageAHash(imgs(Seq(7L)), "content", "media_id")
      .select(col("media_id").as("id"), col("ahash_a"), col("ahash_b"))
      .write.mode("append").parquet(s"$dir/hashes")
    // the next healthy append detects the count mismatch and rebuilds
    // the bloom from ALL stored hashes — B's orphans included
    MultimodalOps.appendMediaHashIndex(spark, dir, imgs(Seq(9L)),
      "content", "media_id")
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(7L, 9L)), "content", "media_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((7L, 7L)) && got.contains((9L, 9L)),
      s"orphaned and fresh rows must both be probe-visible, got $got")
  }

  test("streaming batch discipline: first batch builds, later batches " +
    "append, a replayed batch id commits nothing byte for byte") {
    val dir = tmp("batch")
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(0L, 1L)), "content", "media_id", batchId = 0L),
      "the first batch must build the artifact")
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(2L)), "content", "media_id", batchId = 1L))
    val metaAfter = spark.read.parquet(s"$dir/meta").collect()(0).toSeq
    val hashesAfter = spark.read.parquet(s"$dir/hashes").count()
    assert(!MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(2L)), "content", "media_id", batchId = 1L),
      "a replayed batch id must be skipped")
    assert(spark.read.parquet(s"$dir/meta").collect()(0).toSeq == metaAfter
      && spark.read.parquet(s"$dir/hashes").count() == hashesAfter,
      "the replay must leave the artifact byte-identical")
    // and the maintained artifact probes like a one-shot build
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 2L)), "content", "media_id", maxHamming = 0)
      .filter(col("probe_id") === col("match_id")).count()
    assert(got == 3L)
  }

  test("maintenance stream: landed PNG segments keep the stored " +
    "fingerprint index current, including across a restart") {
    val dir = tmp("live")
    val ckpt = tmp("live_c")
    val idx = tmp("live_i") + "/mh"
    def dropImgs(ids: Seq[Long]): Unit =
      graft.sources.TableSources.writeBinaryDir(
        imgs(ids), dir, "media_id", "content", ".png")
    def start() = graft.streaming.PipelineStreams
      .mediaHashMaintainStream(spark, dir, idx, ckpt)
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
    try awaitIdx(q2, "down-time segment picked up on restart")(
      selfMatches(Seq(0L, 1L, 2L, 3L)) == Set(0L, 1L, 2L, 3L))
    finally q2.stop()
  }

  test("a swap that died between delete and rename is RECOVERED by the " +
    "next ingest batch; fingerprints without any meta are refused, " +
    "never overwritten") {
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
    // append-only fingerprint relation
    assert(MultimodalOps.ingestMediaHashBatch(spark, dir,
      imgs(Seq(2L)), "content", "media_id", batchId = 1L))
    val got = MultimodalOps.probeMediaHashIndex(spark, dir,
        imgs(Seq(0L, 1L, 2L)), "content", "media_id", maxHamming = 0)
      .filter(col("probe_id") === col("match_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L),
      s"recovery must keep the pre-crash fingerprints, got $got")
    // beyond the swap window (no meta, no meta__next, data present):
    // refuse loudly instead of rebuilding over the relation
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta"), true)
    val err = intercept[IllegalArgumentException] {
      MultimodalOps.ingestMediaHashBatch(spark, dir,
        imgs(Seq(3L)), "content", "media_id", batchId = 2L)
    }
    assert(err.getMessage.contains("refusing"))
  }

  test("undecodable payloads are excluded from the index and admitted " +
    "by the dedup filter — stated-plainly semantics") {
    val dir = tmp("undec")
    val garbage = Seq((50L, Array.fill[Byte](32)(0x21)))
      .toDF("media_id", "content")
    MultimodalOps.writeMediaHashIndex(
      imgs(Seq(0L, 1L)).unionByName(garbage), "content", "media_id", dir,
      bands = 2)
    assert(spark.read.parquet(s"$dir/hashes").count() == 2,
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
