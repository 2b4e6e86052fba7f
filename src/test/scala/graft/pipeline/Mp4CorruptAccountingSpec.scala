package graft.pipeline

import graft.SparkTestSession
import graft.sources.TableSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed media vs walker bugs, now distinguishable: payloads the
  * walk cannot resolve are DATA — counted into the caller's
  * accumulator and skipped — while an exception from inside the walker
  * that is not a byte-access/IO failure is a BUG and must FAIL the
  * query instead of vanishing into an empty result. The second half is
  * pinned with the test-only [[MultimodalOps.Mp4WalkFault]] seam. */
class Mp4CorruptAccountingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val goodIds = Seq(0L, 1L, 2L, 3L)
  // distinctive id no other suite's corpus uses (the fault seam is
  // process-global; keyed injection keeps concurrent suites untouched)
  private val faultId = 987654321L

  private def corpusWithGarbage() = {
    val good = MultimodalOps.encodeSyntheticMp4(goodIds.toDF("id"), "id")
    val garbage = Seq(
      (101L, Array.fill[Byte](64)(0x11)),            // not ISO-BMFF at all
      (102L, Array[Byte](0, 0, 0, 9, 'm', 'o', 'o', 'v', 0)), // damaged moov
      (103L, Array.emptyByteArray))                  // empty payload
      .toDF("media_id", "content")
    good.unionByName(garbage)
  }

  test("unresolvable payloads are counted, valid clips are not") {
    val acc = spark.sparkContext.longAccumulator("mp4-unresolved-test")
    val rows = MultimodalOps.mp4SampleTable(
      corpusWithGarbage(), "content", "media_id", Some(acc)).collect()
    assert(acc.value == 3L)
    assert(rows.map(_.getLong(0)).toSet == goodIds.toSet)
  }

  test("a truncated camera-layout clip counts as data, not a bug") {
    val acc = spark.sparkContext.longAccumulator("mp4-trunc-test")
    val cut = MultimodalOps.encodeSyntheticMp4(goodIds.toDF("id"), "id")
      .withColumn("content",
        when(col("media_id") === 2L,
          expr("substring(content, 1, octet_length(content) - 10)"))
          .otherwise(col("content")))
    val rows = MultimodalOps.mp4SampleTable(
      cut, "content", "media_id", Some(acc)).collect()
    assert(acc.value == 1L)
    assert(rows.map(_.getLong(0)).toSet == goodIds.toSet - 2L)
  }

  test("a seeded walker fault fails the query instead of vanishing") {
    val withFault = corpusWithGarbage().unionByName(
      MultimodalOps.encodeSyntheticMp4(Seq(faultId).toDF("id"), "id"))
    MultimodalOps.Mp4WalkFault.inject =
      id => if (id == faultId) throw new IllegalStateException("seeded fault")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        MultimodalOps.mp4SampleTable(withFault, "content", "media_id").count()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(10).toSeq
      assert(chain.exists(t => t.isInstanceOf[IllegalStateException] &&
        t.getMessage == "seeded fault"))
    } finally MultimodalOps.Mp4WalkFault.inject = _ => ()
  }

  test("the sibling walks share the discipline: AVI and frame-pack garbage " +
    "is counted, valid clips flow through") {
    val aviAcc = spark.sparkContext.longAccumulator("avi-acct-test")
    val avis = MultimodalOps.encodeSyntheticAvi(goodIds.toDF("id"), "id")
      .unionByName(Seq((301L, Array.fill[Byte](64)(0x33)))
        .toDF("media_id", "content"))
    val aviRows = MultimodalOps.sampleAviFrames(
      avis, "content", "media_id", 2, Some(aviAcc)).collect()
    assert(aviAcc.value == 1L)
    assert(aviRows.map(_.getLong(0)).toSet == goodIds.toSet)
    val fpAcc = spark.sparkContext.longAccumulator("framepack-acct-test")
    val packs = MultimodalOps.encodeSyntheticFramePack(goodIds.toDF("id"), "id")
      .unionByName(Seq((302L, Array.fill[Byte](64)(0x44)))
        .toDF("media_id", "content"))
    val fpRows = MultimodalOps.sampleFrames(
      packs, "content", "media_id", 2, Some(fpAcc)).collect()
    assert(fpAcc.value == 1L)
    assert(fpRows.map(_.getLong(0)).toSet == goodIds.toSet)
  }

  test("ranged walk: garbage files counted, seeded fault fails the query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mp4-acct").toString
    TableSources.writeBinaryDir(
      MultimodalOps.encodeSyntheticMp4(goodIds.toDF("id"), "id"),
      dir, "media_id", "content", ".mp4")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "clip_201.mp4"), Array.fill[Byte](64)(0x22))
    val files = TableSources.listBinaryDir(spark, dir, "*.mp4")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mp4$", 1).cast("long"))
    val acc = spark.sparkContext.longAccumulator("mp4-ranged-acct-test")
    val rows = MultimodalOps.mp4SampleTableRanged(
      files, "media_path", "media_id", unresolvedCounter = Some(acc)).collect()
    assert(acc.value == 1L)
    assert(rows.map(_.getLong(0)).toSet == goodIds.toSet)
    // fault seam fires inside the ranged resolver too
    MultimodalOps.Mp4WalkFault.inject =
      id => if (id == 2L) throw new IllegalStateException("seeded ranged fault")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        MultimodalOps.mp4SampleTableRanged(
          files, "media_path", "media_id").count()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(10).toSeq
      assert(chain.exists(t => t.isInstanceOf[IllegalStateException] &&
        t.getMessage == "seeded ranged fault"))
    } finally MultimodalOps.Mp4WalkFault.inject = _ => ()
  }
}
