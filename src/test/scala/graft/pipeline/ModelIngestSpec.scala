package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 maintenance symmetry: the LM model and decontamination
  * index gain the same exactly-once streaming batch discipline the
  * WARC/media-hash/quantile legs already have, and the quantile sketch
  * gains the opt-in covered-segments ledger — each pinned as: drops +
  * a replayed drop ≡ the one-shot artifact, regressions refuse loudly.
  */
class ModelIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mi_$tag").toString

  private def day1 = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug")).toDF("doc_id", "text")
  private def day2 = Seq(
    (3L, "a bird flew over the mat"),
    (4L, "the cat ran over the rug")).toDF("doc_id", "text")
  private def day3 = Seq(
    (5L, "the mat sat on a cat")).toDF("doc_id", "text")
  private def scored = Seq(
    (10L, "the cat sat"), (11L, "a dog flew"), (12L, "zz qq")
  ).toDF("doc_id", "text")

  test("ingestLmBatch: first batch builds, later batches append, " +
    "replays skip byte-identically, a regressed id refuses loudly, and " +
    "the maintained model scores exactly like the one-shot build") {
    val live = tmp("lm_live") + "/lm"
    val oneShot = tmp("lm_one") + "/lm"
    // an all-empty-text first batch cannot pin V > 0: the build defers
    assert(!TextOps.ingestLmBatch(spark, live,
      Seq((0L, "")).toDF("doc_id", "text"), "text", "doc_id", 0L),
      "a bigram-free first batch must defer the build")
    assert(!new java.io.File(s"$live/meta").exists(),
      "nothing may be committed for a deferred build")
    assert(TextOps.ingestLmBatch(spark, live, day1, "text", "doc_id", 1L))
    assert(TextOps.ingestLmBatch(spark, live, day2, "text", "doc_id", 2L))
    assert(TextOps.ingestLmBatch(spark, live, day3, "text", "doc_id", 3L))
    def scores(path: String) = TextOps.scoreAgainstStoredLm(spark, path,
        scored, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val metaBefore = spark.read.parquet(s"$live/meta").collect()(0).toSeq
    val before = scores(live)
    // crash-replay signature: at or one below the pointer skips quietly
    assert(!TextOps.ingestLmBatch(spark, live, day3, "text", "doc_id", 3L))
    assert(!TextOps.ingestLmBatch(spark, live, day3, "text", "doc_id", 2L))
    assert(spark.read.parquet(s"$live/meta").collect()(0).toSeq == metaBefore
      && scores(live) == before,
      "replays must leave the model byte-identical")
    // a further regression is a reset checkpoint / second writer
    val err = intercept[IllegalArgumentException] {
      TextOps.ingestLmBatch(spark, live, day1, "text", "doc_id", 0L)
    }
    assert(err.getMessage.contains("appendLmModel") &&
      err.getMessage.contains("regressed"))
    // the maintained artifact ≡ the one-shot build, score for score
    TextOps.writeLmModel(day1.union(day2).union(day3), "text", "doc_id",
      oneShot)
    assert(scores(live) == scores(oneShot))
  }

  test("ingestDecontamBatch: the maintained index screens exactly like " +
    "the one-shot build; replays skip; regressions refuse loudly; " +
    "count epochs without meta are never rebuilt over") {
    val live = tmp("dc_live") + "/dc"
    val oneShot = tmp("dc_one") + "/dc"
    def suite(ids: Seq[Long], tok: String) =
      ids.map(i => (i, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5"))
        .toDF("bench_id", "text")
    val s1 = suite(Seq(100L), "w")
    val s2 = suite(Seq(200L), "x")
    val train = Seq(
      (1L, "w1 w2 w3 w4 w5 extra"), // overlaps suite 1
      (2L, "x1 x2 x3 x4 x5 extra"), // overlaps suite 2
      (3L, "q1 q2 q3 q4 q5 clean")).toDF("doc_id", "text")
    assert(TextOps.ingestDecontamBatch(spark, live, s1, "text",
      "bench_id", 0L, shingleK = 3))
    assert(TextOps.ingestDecontamBatch(spark, live, s2, "text",
      "bench_id", 1L))
    def flags(path: String) = TextOps.screenAgainstStoredDecontam(spark,
        path, train, "text", "doc_id", minOverlap = 2L)
      .collect().map(_.toSeq).toSet
    val before = flags(live)
    assert(before.map(_.head) == Set(1L, 2L),
      s"both overlapping docs must flag, got $before")
    assert(!TextOps.ingestDecontamBatch(spark, live, s2, "text",
      "bench_id", 1L), "a replayed batch id must skip")
    assert(!TextOps.ingestDecontamBatch(spark, live, s2, "text",
      "bench_id", 0L), "one below the pointer is still a crash replay")
    assert(flags(live) == before)
    val err = intercept[IllegalArgumentException] {
      TextOps.ingestDecontamBatch(spark, live, s1, "text", "bench_id", -1L)
    }
    assert(err.getMessage.contains("appendDecontamIndex") &&
      err.getMessage.contains("regressed"))
    TextOps.writeDecontamIndex(s1.union(s2), "text", "bench_id", oneShot,
      shingleK = 3)
    assert(flags(live) == flags(oneShot),
      "maintained index must screen exactly like the one-shot build")
    // shingle epochs with no recoverable meta: refuse, never rebuild over
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$live/meta"), true)
    val err2 = intercept[IllegalArgumentException] {
      TextOps.ingestDecontamBatch(spark, live, s1, "text", "bench_id", 2L)
    }
    assert(err2.getMessage.contains("refusing"))
  }

  test("ingestQuantileSegment: a named slice folds exactly once — the " +
    "re-dropped segment is a no-op via the covered-segments ledger; " +
    "unledgered appends still compose; the ledgered artifact equals " +
    "the one-shot sketch") {
    val live = tmp("qs_live") + "/qs"
    val oneShot = tmp("qs_one") + "/qs"
    def slice(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 3).cast("string").as("grp"),
        (col("id") * 7 % 100).as("v"))
    val pm = Seq(500, 900)
    def quant(path: String) = StatsOps.quantilesFromStoredSketch(spark,
        path, pm)
      .collect().map(_.toSeq).toSet
    assert(StatsOps.ingestQuantileSegment(spark, live, slice(0, 100),
      Seq("grp"), col("v"), segmentId = "day-001"))
    assert(StatsOps.ingestQuantileSegment(spark, live, slice(100, 200),
      Seq("grp"), col("v"), segmentId = "day-002"))
    val before = quant(live)
    // the orchestrator retry: both days re-drop, nothing double-counts
    assert(!StatsOps.ingestQuantileSegment(spark, live, slice(0, 100),
      Seq("grp"), col("v"), segmentId = "day-001"),
      "a covered segment must be a no-op")
    assert(!StatsOps.ingestQuantileSegment(spark, live, slice(100, 200),
      Seq("grp"), col("v"), segmentId = "day-002"))
    assert(quant(live) == before,
      "re-drops must leave the sketch byte-identical")
    // an unledgered append composes (and carries the ledger forward)…
    StatsOps.appendQuantileIndex(spark, live, slice(200, 250), col("v"))
    // …so the earlier segments STILL re-drop as no-ops afterwards
    assert(!StatsOps.ingestQuantileSegment(spark, live, slice(0, 100),
      Seq("grp"), col("v"), segmentId = "day-001"),
      "the ledger must survive unledgered appends")
    // a fresh name folds in
    assert(StatsOps.ingestQuantileSegment(spark, live, slice(250, 300),
      Seq("grp"), col("v"), segmentId = "day-003"))
    StatsOps.writeQuantileIndex(slice(0, 300), Seq("grp"), col("v"),
      oneShot)
    assert(quant(live) == quant(oneShot),
      "drops + re-drops + unledgered appends ≡ the one-shot sketch")
  }

  test("ingestQuantileBatch: replay-of-pointer skips, a regressed id " +
    "refuses loudly, bucket epochs without meta are refused") {
    val live = tmp("qs_batch") + "/qs"
    def slice(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 3).cast("string").as("grp"),
        (col("id") * 7 % 100).as("v"))
    assert(StatsOps.ingestQuantileBatch(spark, live, slice(0, 50),
      Seq("grp"), col("v"), batchId = 0L))
    assert(StatsOps.ingestQuantileBatch(spark, live, slice(50, 100),
      Seq("grp"), col("v"), batchId = 1L))
    assert(!StatsOps.ingestQuantileBatch(spark, live, slice(50, 100),
      Seq("grp"), col("v"), batchId = 1L))
    assert(!StatsOps.ingestQuantileBatch(spark, live, slice(50, 100),
      Seq("grp"), col("v"), batchId = 0L))
    val err = intercept[IllegalArgumentException] {
      StatsOps.ingestQuantileBatch(spark, live, slice(0, 50),
        Seq("grp"), col("v"), batchId = -1L)
    }
    assert(err.getMessage.contains("regressed"))
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$live/meta"), true)
    val err2 = intercept[IllegalArgumentException] {
      StatsOps.ingestQuantileBatch(spark, live, slice(0, 50),
        Seq("grp"), col("v"), batchId = 2L)
    }
    assert(err2.getMessage.contains("refusing"))
  }

  test("ingestMinhashBatch: the maintained near-dup index screens " +
    "exactly like the one-shot build; replays skip; regressions refuse " +
    "loudly; signature epochs without meta are never rebuilt over") {
    val live = tmp("mh_live") + "/mh"
    val oneShot = tmp("mh_one") + "/mh"
    def seg(ids: Seq[Long], tok: String) =
      ids.map(i => (i, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5 ${tok}6"))
        .toDF("doc_id", "text")
    val s1 = seg(Seq(2L), "w")
    val s2 = seg(Seq(4L), "x")
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6"), (13L, "x1 x2 x3 x4 x5 x6"))
      .toDF("doc_id", "text")
    assert(DedupOps.ingestMinhashBatch(spark, live, s1, "text", "doc_id",
      batchId = 0L), "the first batch must build the artifact")
    assert(DedupOps.ingestMinhashBatch(spark, live, s2, "text", "doc_id",
      batchId = 1L))
    def flags(path: String) = DedupOps.nearDupAgainstStoredIndex(spark,
        path, batch, "text", "doc_id", 0.5)
      .collect().map(_.toSeq).toSet
    val before = flags(live)
    assert(before.map(_.head) == Set(11L, 13L),
      s"both segments' copies must flag, got $before")
    assert(!DedupOps.ingestMinhashBatch(spark, live, s2, "text",
      "doc_id", batchId = 1L), "a replayed batch id must skip")
    assert(!DedupOps.ingestMinhashBatch(spark, live, s2, "text",
      "doc_id", batchId = 0L), "one below the pointer is a crash replay")
    assert(flags(live) == before)
    val err = intercept[IllegalArgumentException] {
      DedupOps.ingestMinhashBatch(spark, live, s1, "text", "doc_id",
        batchId = -1L)
    }
    assert(err.getMessage.contains("appendMinhashIndex") &&
      err.getMessage.contains("regressed"))
    DedupOps.writeMinhashIndex(s1.union(s2), "text", "doc_id", oneShot)
    assert(flags(live) == flags(oneShot),
      "maintained index must screen exactly like the one-shot build")
    // signature epochs with no recoverable meta: refuse, never rebuild
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$live/meta"), true)
    val err2 = intercept[IllegalArgumentException] {
      DedupOps.ingestMinhashBatch(spark, live, s1, "text", "doc_id", 2L)
    }
    assert(err2.getMessage.contains("refusing"))
  }

  test("ingestLmBatch: count epochs with no recoverable meta are " +
    "refused loudly, and a torn meta swap is recovered") {
    val live = tmp("lm_swap") + "/lm"
    assert(TextOps.ingestLmBatch(spark, live, day1, "text", "doc_id", 0L))
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // torn swap: meta deleted, complete meta__next never renamed
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$live/meta"),
      new org.apache.hadoop.fs.Path(s"$live/meta__next")))
    assert(TextOps.ingestLmBatch(spark, live, day2, "text", "doc_id", 1L),
      "a recoverable torn swap must be completed and the batch applied")
    // beyond the window: no meta at all, counts present — refuse
    fs.delete(new org.apache.hadoop.fs.Path(s"$live/meta"), true)
    val err = intercept[IllegalArgumentException] {
      TextOps.ingestLmBatch(spark, live, day3, "text", "doc_id", 2L)
    }
    assert(err.getMessage.contains("refusing"))
  }
}
