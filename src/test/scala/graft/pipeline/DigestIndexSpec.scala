package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted exact-digest index (twelfth artifact lifecycle):
  * build/append/probe against the caller-owned-relation ground truth,
  * torn-append isolation, idempotent re-drops, epoch GC, window
  * compaction, the streaming batch discipline, swap recovery, and the
  * bloom capacity WARN — exact dedup's stored form, pinned the same way
  * as the MinHash/decontam/media-hash artifacts. */
class DigestIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Content repeats across ids sharing id % 7 — cross-segment exact
    * duplicates without shared ids. */
  private def docs(ids: Seq[Long]) =
    ids.map(i => (i, s"document body ${i % 7}")).toDF("doc_id", "text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dgi_$tag").toString

  private def epochs(root: String): Set[String] =
    graft.SpecSupport.epochs(root)

  /** The index's VISIBLE digests — what probes see: the meta window's
    * epoch union, never raw directory contents. */
  private def visibleDigests(dir: String) = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    spark.read.parquet(
      (meta.getAs[Long]("digest_base") to meta.getAs[Long]("epoch"))
        .map(e => s"$dir/digests/e$e"): _*)
  }

  private def visibleDataFiles(dir: String): Int = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    (meta.getAs[Long]("digest_base") to meta.getAs[Long]("epoch")).map { e =>
      Option(new java.io.File(s"$dir/digests/e$e").listFiles()).toSeq.flatten
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    }.sum
  }

  test("build + append + probe: the stored path agrees with the " +
    "caller-owned dedupAgainstIndex exactly; re-append is a no-op; " +
    "derived epochs keep {current, superseded}") {
    val dir = tmp("life")
    val built = Seq(0L, 2L, 4L)
    val appended = Seq(6L, 8L)
    DedupOps.writeDigestIndex(docs(built), "text", dir)
    DedupOps.appendDigestIndex(spark, dir, docs(appended), "text")
    // stored contents: {0,2,4,6,1} (8%7=1) — 5 distinct digests
    assert(visibleDigests(dir).count() == 5L)
    val probeIds = Seq(1L, 2L, 3L, 9L, 10L, 100L)
    val batch = docs(probeIds)
    // ground truth: the caller-owned relation over the SAME corpus
    val truth = DedupOps.dedupAgainstIndex(batch,
        DedupOps.digestIndex(docs(built ++ appended), "text"),
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = DedupOps.dedupExactAgainstStoredIndex(spark, dir, batch,
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == truth, s"stored-path survivors $got != truth $truth")
    // spelled out: 1 (=8), 2, 9 (=2) and 100 (=2) are stored dups; 3
    // and 10 share NOVEL content (both %7=3) — the in-batch keep-min-id
    // window keeps 3 and drops 10
    assert(got == Set(3L))
    // the probe names each stored duplicate
    val matched = DedupOps.probeDigestIndex(spark, dir, batch, "text",
      "doc_id").collect().map(_.getLong(0)).toSet
    assert(matched == Set(1L, 2L, 9L, 100L))
    // idempotent re-drop: the whole corpus re-appends, nothing changes
    DedupOps.appendDigestIndex(spark, dir, docs(built ++ appended), "text")
    assert(visibleDigests(dir).count() == 5L,
      "a re-dropped segment must append zero digests")
    assert(DedupOps.dedupExactAgainstStoredIndex(spark, dir, batch,
      "text", "doc_id").select("doc_id").collect()
      .map(_.getLong(0)).toSet == truth)
    // epoch GC: two appends later only {current, superseded} remain
    assert(epochs(s"$dir/derived") == Set("e1", "e2"),
      s"got ${epochs(s"$dir/derived")}")
  }

  test("null-text parity with the caller-owned path: a stored null-text " +
    "sentinel never captures a null-text probe (the equi-join would " +
    "match \"\" against \"\" where the anti-join's null never joins)") {
    val dir = tmp("nulls")
    val hist = Seq((0L, "alpha"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    DedupOps.writeDigestIndex(hist, "text", dir)
    val batch = Seq((1L, null.asInstanceOf[String]), (3L, "alpha"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val truth = DedupOps.dedupAgainstIndex(batch,
        DedupOps.digestIndex(hist, "text"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = DedupOps.dedupExactAgainstStoredIndex(spark, dir, batch,
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == truth, s"stored $got != caller-owned $truth")
    // spelled out: 1 survives (null never matches the stored sentinel),
    // 5 is 1's in-batch dup, 3 is a stored dup
    assert(got == Set(1L))
    assert(DedupOps.probeDigestIndex(spark, dir, batch, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet == Set(3L),
      "only the real duplicate may match — never the null sentinel")
  }

  test("a torn append's orphan epoch is invisible to probes; the " +
    "retried append replaces it wholesale — landed exactly once") {
    val dir = tmp("torn")
    DedupOps.writeDigestIndex(docs(Seq(0L, 1L)), "text", dir)
    // simulate the torn append: segment B's delta epoch dir landed,
    // the derived epoch + meta swap never ran (the crash window)
    DedupOps.digestIndex(docs(Seq(3L)), "text")
      .write.mode("overwrite").parquet(s"$dir/digests/e1")
    assert(DedupOps.probeDigestIndex(spark, dir, docs(Seq(10L)), // 10%7=3
      "text", "doc_id").count() == 0L,
      "an unswapped epoch must be invisible")
    assert(visibleDigests(dir).count() == 2L)
    // the orchestrator retries segment B: the retry lands on the same
    // epoch number, overwrites the orphan dir wholesale, and commits
    DedupOps.appendDigestIndex(spark, dir, docs(Seq(3L)), "text")
    assert(visibleDigests(dir).count() == 3L,
      "the retried segment must land exactly once")
    assert(DedupOps.probeDigestIndex(spark, dir, docs(Seq(10L)),
      "text", "doc_id").count() == 1L)
  }

  test("streaming batch discipline: first batch builds, later batches " +
    "append, a replayed batch id commits nothing byte for byte, an id " +
    "regressing further than the replay window refuses loudly") {
    val dir = tmp("batch")
    assert(DedupOps.ingestDigestBatch(spark, dir, docs(Seq(0L, 1L)),
      "text", batchId = 0L), "the first batch must build the artifact")
    assert(DedupOps.ingestDigestBatch(spark, dir, docs(Seq(2L)), "text",
      batchId = 1L))
    assert(DedupOps.ingestDigestBatch(spark, dir, docs(Seq(3L)), "text",
      batchId = 2L))
    val metaAfter = spark.read.parquet(s"$dir/meta").collect()(0).toSeq
    val digestsAfter = visibleDigests(dir).count()
    assert(!DedupOps.ingestDigestBatch(spark, dir, docs(Seq(3L)), "text",
      batchId = 2L), "a replayed batch id must be skipped")
    assert(!DedupOps.ingestDigestBatch(spark, dir, docs(Seq(3L)), "text",
      batchId = 1L),
      "an id one below the pointer is still the crash-replay signature")
    assert(spark.read.parquet(s"$dir/meta").collect()(0).toSeq == metaAfter
      && visibleDigests(dir).count() == digestsAfter,
      "the replay must leave the artifact byte-identical")
    val err = intercept[IllegalArgumentException] {
      DedupOps.ingestDigestBatch(spark, dir, docs(Seq(9L)), "text",
        batchId = 0L)
    }
    assert(err.getMessage.contains("appendDigestIndex") &&
      err.getMessage.contains("regressed"))
    // and the maintained artifact probes like a one-shot build
    assert(DedupOps.probeDigestIndex(spark, dir, docs(Seq(0L, 1L, 2L, 3L)),
      "text", "doc_id").count() == 4L)
  }

  test("compaction: build -> N appends -> compact leaves probe output " +
    "byte-identical, re-bases the window onto one file-set, and the " +
    "next compaction's janitor prunes the superseded generation") {
    val dir = tmp("compact")
    DedupOps.writeDigestIndex(docs(Seq(0L, 1L)), "text", dir)
    DedupOps.appendDigestIndex(spark, dir, docs(Seq(2L, 3L)), "text")
    DedupOps.appendDigestIndex(spark, dir, docs(Seq(4L)), "text")
    val batch = docs(Seq(1L, 5L, 9L, 100L))
    def probe() = DedupOps.probeDigestIndex(spark, dir, batch, "text",
      "doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val before = probe()
    assert(epochs(s"$dir/digests") == Set("e0", "e1", "e2"),
      "one digest epoch dir per commit before compaction")
    // below the policy threshold nothing happens...
    assert(!DedupOps.maybeCompactDigestIndex(spark, dir, 4))
    // ...at it, the window compacts
    assert(DedupOps.maybeCompactDigestIndex(spark, dir, 3))
    val metaRow = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(metaRow.getAs[Long]("epoch") == 3L &&
      metaRow.getAs[Long]("digest_base") == 3L &&
      metaRow.getAs[Long]("digest_count") == 5L)
    assert(probe() == before, "compaction must not change probe output")
    assert(visibleDataFiles(dir) == 1,
      "the visible window must be one file-set")
    // the superseded generation gets ONE compaction's grace...
    assert(epochs(s"$dir/digests") == Set("e0", "e1", "e2", "e3"))
    // ...and the NEXT compaction's janitor prunes below the old base
    // (the appended segment is all-duplicate — content 8%7=1 is stored —
    // so probe output stays fixed through the whole sequence)
    DedupOps.appendDigestIndex(spark, dir, docs(Seq(8L)), "text")
    DedupOps.compactDigestIndex(spark, dir)
    assert(epochs(s"$dir/digests") == Set("e3", "e4", "e5"),
      s"got ${epochs(s"$dir/digests")}")
    assert(probe() == before)
  }

  test("a swap that died between delete and rename is RECOVERED by the " +
    "next ingest batch; digests without any meta are refused, never " +
    "overwritten") {
    val dir = tmp("swapwin")
    assert(DedupOps.ingestDigestBatch(spark, dir, docs(Seq(0L, 1L)),
      "text", batchId = 0L))
    // reproduce the exact crash window: meta deleted, the fully
    // written meta__next never renamed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/meta"),
      new org.apache.hadoop.fs.Path(s"$dir/meta__next")))
    // the next batch must COMPLETE the swap and append — a naive
    // missing-meta check would rebuild with overwrite and wipe the
    // digest relation
    assert(DedupOps.ingestDigestBatch(spark, dir, docs(Seq(2L)), "text",
      batchId = 1L))
    assert(DedupOps.probeDigestIndex(spark, dir, docs(Seq(0L, 1L, 2L)),
      "text", "doc_id").count() == 3L,
      "recovery must keep the pre-crash digests")
    // beyond the swap window (no meta, no recoverable tmp, data
    // present): refuse loudly instead of rebuilding over the relation
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta"), true)
    val err = intercept[IllegalArgumentException] {
      DedupOps.ingestDigestBatch(spark, dir, docs(Seq(3L)), "text",
        batchId = 2L)
    }
    assert(err.getMessage.contains("refusing"))
  }

  test("bloom capacity WARN: an append pushing past ~numBits/10 digests " +
    "warns loudly; below capacity stays silent") {
    val dir = tmp("satur")
    // 64-bit bloom: capacity = 6 digests at 10 bits/element
    val (_, quiet) = graft.SpecSupport.capturingErr {
      DedupOps.writeDigestIndex(docs(Seq(0L, 1L, 2L, 3L)), "text", dir,
        bloomBits = 64)
      DedupOps.appendDigestIndex(spark, dir, docs(Seq(4L, 5L)), "text")
      // 6 distinct digests == capacity
    }
    assert(!quiet.contains("design capacity"),
      s"below-capacity appends must stay silent, got: $quiet")
    val (_, loud) = graft.SpecSupport.capturingErr {
      DedupOps.appendDigestIndex(spark, dir, docs(Seq(6L)), "text")
      // 7 distinct digests > 6
    }
    assert(loud.contains("design capacity") && loud.contains(dir),
      s"an over-capacity append must warn, got: $loud")
  }
}
