package graft.pipeline

import graft.SparkTestSession
import graft.sources.TableSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fragmented MP4 (moof/traf/trun — the DASH/HLS layout): an
  * empty-stbl init moov followed by per-fragment sample tables, with
  * dts and sample_idx accumulating across fragments and sync on each
  * fragment's leading sample. Both trun shapes are exercised
  * corpus-wide (even ids: per-sample durations, 8-byte entries; odd
  * ids: tfhd default-sample-duration, 4-byte entries). Truncation is
  * honest at fragment granularity: a cut anywhere yields exactly the
  * samples whose moof parsed fully AND whose payload is fully present
  * — swept at every byte. */
class Fmp4ContainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L)

  /** Formula twin of the walker's output:
    * (sample_idx, offset, size, dts, is_sync, timescale). */
  private def expected(id: Long): Seq[(Long, Long, Long, Long, Boolean, Long)] = {
    val even = id % 2 == 0
    val delta = MultimodalOps.synthMp4Delta(id).toLong
    val ts = MultimodalOps.synthMp4Timescale(id).toLong
    var fragStart = 595L // 24 ftyp + 571 moov
    var i = 0L
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Boolean, Long)]
    for (f <- 0 until MultimodalOps.synthFmp4Fragments(id)) {
      val m = MultimodalOps.synthFmp4FragSamples(id, f)
      val moofSz = if (even) 68 + 8 * m else 72 + 4 * m
      var off = fragStart + moofSz + 8
      var s = 0L
      for (j <- 0 until m) {
        val sz = MultimodalOps.synthFmp4SampleSize(id, i.toInt).toLong
        out += ((i, off, sz, i * delta, j == 0, ts))
        off += sz; s += sz; i += 1
      }
      fragStart += moofSz + 8 + s // moof (incl. its header) + mdat hdr + payload
    }
    out.toSeq
  }

  private def walk(df: org.apache.spark.sql.DataFrame) =
    MultimodalOps.mp4SampleTable(df, "content", "media_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("the walker resolves fragments exactly as the formulas predict") {
    val got = walk(MultimodalOps.encodeSyntheticFmp4(ids.toDF("id"), "id"))
    ids.foreach { id =>
      assert(got.getOrElse(id, Nil) == expected(id), s"id $id")
    }
  }

  test("both trun shapes really differ on the wire") {
    val bytes = MultimodalOps.encodeSyntheticFmp4(Seq(0L, 1L).toDF("id"), "id")
      .orderBy("media_id").collect().map(_.getAs[Array[Byte]](1))
    def beInt(b: Array[Byte], p: Int): Int =
      java.nio.ByteBuffer.wrap(b, p, 4).getInt
    def findBox(b: Array[Byte], tag: String): Int = {
      val t = new String(b, "ISO-8859-1"); t.indexOf(tag) - 4
    }
    // even id 0: tfhd flags 0x020000, trun flags 0x301
    val tf0 = findBox(bytes(0), "tfhd")
    assert(beInt(bytes(0), tf0 + 8) == 0x020000)
    val tr0 = findBox(bytes(0), "trun")
    assert(beInt(bytes(0), tr0 + 8) == 0x000301)
    // odd id 1: tfhd flags 0x020008 (+default duration), trun 0x201
    val tf1 = findBox(bytes(1), "tfhd")
    assert(beInt(bytes(1), tf1 + 8) == 0x020008)
    assert(beInt(bytes(1), tf1 + 16) == MultimodalOps.synthMp4Delta(1L))
    val tr1 = findBox(bytes(1), "trun")
    assert(beInt(bytes(1), tr1 + 8) == 0x000201)
  }

  test("truncation at EVERY cut keeps exactly the provably-present samples") {
    for (id <- Seq(2L, 3L)) {
      val full = MultimodalOps.encodeSyntheticFmp4(Seq(id).toDF("id"), "id")
        .collect()(0).getAs[Array[Byte]](1)
      val exp = expected(id)
      // a sample survives a cut at c iff its moof box is fully inside c
      // AND its payload [offset, offset+size) is inside c. Reconstruct
      // each sample's moof extent from the formulas:
      val even = id % 2 == 0
      var fragStart = 595L
      val moofEnds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // per sample: moof end
      var i = 0
      for (f <- 0 until MultimodalOps.synthFmp4Fragments(id)) {
        val m = MultimodalOps.synthFmp4FragSamples(id, f)
        val moofSz = if (even) 68 + 8 * m else 72 + 4 * m
        var s = 0L
        for (_ <- 0 until m) {
          moofEnds += ((i.toLong, fragStart + moofSz))
          s += MultimodalOps.synthFmp4SampleSize(id, i).toLong
          i += 1
        }
        fragStart += moofSz + 8 + s
      }
      val moofEnd = moofEnds.toMap
      for (cut <- 0 to full.length) {
        val part = java.util.Arrays.copyOf(full, cut)
        val got = walk(Seq((id, part)).toDF("media_id", "content"))
          .getOrElse(id, Nil)
        val want = exp.takeWhile { case (si, off, sz, _, _, _) =>
          moofEnd(si) <= cut && off + sz <= cut
        }
        assert(got == want, s"id $id cut $cut")
      }
    }
  }

  test("the ranged walk resolves fragments identically from moof-only fetches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmp4").toString
    TableSources.writeBinaryDir(
      MultimodalOps.encodeSyntheticFmp4(ids.toDF("id"), "id"),
      dir, "media_id", "content", ".mp4")
    val files = TableSources.listBinaryDir(spark, dir, "*.mp4")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mp4$", 1).cast("long"))
    val ranged = MultimodalOps.mp4SampleTableRanged(
        files, "media_path", "media_id")
      .collect().map(_.toSeq).toSet
    val inMem = MultimodalOps.mp4SampleTable(
        MultimodalOps.encodeSyntheticFmp4(ids.toDF("id"), "id"),
        "content", "media_id")
      .collect().map(_.toSeq).toSet
    assert(ranged == inMem && ranged.nonEmpty)
  }

  test("fragmented REAL-PNG video demuxes through the shared frame pipeline") {
    val vids = MultimodalOps.encodeSyntheticFmp4Video(ids.toDF("id"), "id")
    val got = MultimodalOps.sampleMp4Frames(vids, "content", "media_id", 2)
      .collect().map(_.toSeq).toSet
    val progressive = MultimodalOps.sampleMp4Frames(
      MultimodalOps.encodeSyntheticMp4Video(ids.toDF("id"), "id"),
      "content", "media_id", 2)
      .collect().map(_.toSeq).toSet
    // same logical clip, same stride → identical decoded output
    assert(got == progressive && got.nonEmpty)
  }
}
