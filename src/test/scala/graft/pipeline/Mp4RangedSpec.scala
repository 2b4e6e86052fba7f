package graft.pipeline

import graft.SparkTestSession
import graft.sources.TableSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ranged-read media path: file listing without content, moov
  * resolved from positioned reads, frame payloads fetched by byte range
  * — the no-ceiling twin of the in-memory MP4 walk. Parity is pinned
  * against the in-memory operators on the same on-disk corpus, and the
  * ceiling-freedom is proven by LOWERING the binaryFile source's
  * maxLength until whole-file ingestion genuinely fails while the
  * ranged path still resolves everything. */
class Mp4RangedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L, 5L, 8L, 11L) // stco+co64, mdhd v0+v1

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def writeCorpus(dir: String, faststart: Boolean): Unit =
    TableSources.writeBinaryDir(
      MultimodalOps.encodeSyntheticMp4(ids.toDF("id"), "id", faststart),
      dir, "media_id", "content", ".mp4")

  private def listed(dir: String) =
    TableSources.listBinaryDir(spark, dir, "*.mp4")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mp4$", 1).cast("long"))

  private def tableRows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("ranged sample table matches the in-memory walk, both layouts") {
    for (faststart <- Seq(false, true)) {
      val dir = freshDir("mp4-ranged")
      writeCorpus(dir, faststart)
      val inMem = MultimodalOps.mp4SampleTable(
        MultimodalOps.encodeSyntheticMp4(ids.toDF("id"), "id", faststart),
        "content", "media_id")
      val ranged = MultimodalOps.mp4SampleTableRanged(
        listed(dir), "media_path", "media_id")
      assert(tableRows(ranged) == tableRows(inMem))
      assert(tableRows(ranged).nonEmpty)
    }
  }

  test("ranged frame sampling matches sampleMp4Frames") {
    val dir = freshDir("mp4v-ranged")
    val vids = MultimodalOps.encodeSyntheticMp4Video(ids.toDF("id"), "id")
    TableSources.writeBinaryDir(vids, dir, "media_id", "content", ".mp4")
    val inMem = MultimodalOps.sampleMp4Frames(vids, "content", "media_id", 2)
    val ranged = MultimodalOps.sampleMp4FramesRanged(
      listed(dir), "media_path", "media_id", 2)
    assert(tableRows(ranged) == tableRows(inMem))
    assert(tableRows(ranged).nonEmpty)
    // the two-phase intra-file-parallel form: identical rows through
    // the range-partitioned per-sample fetch+decode, and a ghost file
    // still resolves to nothing with the file counted (not a crash in
    // the per-sample phase — there are no samples to fetch without a
    // resolved table)
    val par = MultimodalOps.sampleMp4FramesRangedParallel(
      listed(dir), "media_path", "media_id", 2)
    assert(tableRows(par) == tableRows(inMem))
    val acc = spark.sparkContext.longAccumulator("mp4-par-acct")
    import spark.implicits._
    assert(MultimodalOps.sampleMp4FramesRangedParallel(
      Seq((7L, s"$dir/missing.mp4")).toDF("media_id", "media_path"),
      "media_path", "media_id", 2, unresolvedCounter = Some(acc))
      .count() == 0L)
    assert(acc.value == 1L)
    // duplicate media_ids are ambiguous for the id-keyed phase-2
    // fetch: refused loudly, not silently multiplied
    val dupPath = listed(dir).limit(1).collect()(0).getString(0)
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.sampleMp4FramesRangedParallel(
        Seq((3L, dupPath), (3L, dupPath)).toDF("media_id", "media_path"),
        "media_path", "media_id", 2).count()
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("ranged path has no file-size ceiling where whole-file ingestion fails") {
    val dir = freshDir("mp4-ceiling")
    writeCorpus(dir, faststart = false)
    val key = "spark.sql.sources.binaryFile.maxLength"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "64") // every clip exceeds this
      // whole-file ingestion genuinely fails at its ceiling...
      val e = intercept[org.apache.spark.SparkException] {
        TableSources.readBinaryDir(spark, dir, "*.mp4")
          .select(sum(length(col("content")))).collect()
      }
      assert(e.getMessage != null)
      // ...while listing (content never selected) and the ranged walk
      // still deliver the full corpus
      assert(listed(dir).count() == ids.size.toLong)
      val ranged = MultimodalOps.mp4SampleTableRanged(
        listed(dir), "media_path", "media_id")
      assert(ranged.select(countDistinct(col("media_id"))).as[Long].head()
        == ids.size.toLong)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("oversized moov, garbage bytes, and vanished files resolve to no rows") {
    val dir = freshDir("mp4-degraded")
    writeCorpus(dir, faststart = false)
    // a non-MP4 payload in the same directory
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "clip_99.mp4"),
      Array.fill[Byte](256)(0x5A))
    val withGarbage = listed(dir)
    val rows = MultimodalOps.mp4SampleTableRanged(
      withGarbage, "media_path", "media_id")
    assert(!rows.select(col("media_id")).as[Long].collect().contains(99L))
    // a moov cap below every real moov rejects all files, quietly
    val capped = MultimodalOps.mp4SampleTableRanged(
      withGarbage, "media_path", "media_id", maxMoovBytes = 16L)
    assert(capped.count() == 0L)
    // a path that does not exist resolves to no rows, not a task failure
    val ghost = Seq((7L, s"$dir/definitely-missing.mp4"))
      .toDF("media_id", "media_path")
    assert(MultimodalOps.mp4SampleTableRanged(
      ghost, "media_path", "media_id").count() == 0L)
  }

  test("AVI ranged walk matches the in-memory walk (MPNG and MJPG)") {
    for (codec <- Seq("MPNG", "MJPG")) {
      val dir = freshDir(s"avi-ranged-$codec")
      val avis = MultimodalOps.encodeSyntheticAvi(ids.toDF("id"), "id", codec)
      TableSources.writeBinaryDir(avis, dir, "media_id", "content", ".avi")
      val files = TableSources.listBinaryDir(spark, dir, "*.avi")
        .withColumn("media_id",
          regexp_extract(col("media_path"), "clip_(\\d+)\\.avi$", 1)
            .cast("long"))
      val inMem = MultimodalOps.sampleAviFrames(avis, "content", "media_id", 2)
      val ranged = MultimodalOps.sampleAviFramesRanged(
        files, "media_path", "media_id", 2)
      assert(tableRows(ranged) == tableRows(inMem))
      assert(tableRows(ranged).nonEmpty)
      // the table-then-fetch split + shared parallel decode core must
      // match both forms exactly, per codec
      val par = MultimodalOps.sampleAviFramesRangedParallel(
        files, "media_path", "media_id", 2)
      assert(tableRows(par) == tableRows(inMem), s"codec $codec")
    }
    // garbage and ghost files resolve to no rows, counted
    val dir = freshDir("avi-ranged-bad")
    TableSources.writeBinaryDir(
      MultimodalOps.encodeSyntheticAvi(ids.toDF("id"), "id"),
      dir, "media_id", "content", ".avi")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "clip_99.avi"), Array.fill[Byte](64)(0x5B))
    val acc = spark.sparkContext.longAccumulator("avi-ranged-acct")
    val rows = MultimodalOps.sampleAviFramesRanged(
      listedAvi(dir), "media_path", "media_id", 2, Some(acc)).collect()
    assert(acc.value == 1L)
    assert(!rows.map(_.getLong(0)).contains(99L))
  }

  private def listedAvi(dir: String) =
    TableSources.listBinaryDir(spark, dir, "*.avi")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.avi$", 1)
          .cast("long"))

  test("writeBinaryDir round-trips content through readBinaryDir") {
    val dir = freshDir("mp4-roundtrip")
    writeCorpus(dir, faststart = false)
    val back = TableSources.readBinaryDir(spark, dir, "*.mp4")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mp4$", 1).cast("long"))
      .select(col("media_id"), col("content"))
    val orig = MultimodalOps.encodeSyntheticMp4(ids.toDF("id"), "id")
    val joined = back.as("a").join(orig.as("b"), Seq("media_id"))
      .select(col("media_id"),
        (col("a.content") === col("b.content")).as("same"))
      .collect()
    assert(joined.length == ids.size && joined.forall(_.getBoolean(1)))
  }
}
