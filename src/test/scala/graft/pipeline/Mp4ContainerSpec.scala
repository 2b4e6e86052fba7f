package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF (MP4) container: big-endian box walk over
  * moov/trak/mdia/minf/stbl resolving the five sample tables
  * (stts/stss/stsz/stsc/stco|co64) into per-sample rows, with the AVI
  * walk's honest-degradation semantics — a damaged sample table yields
  * nothing, a truncated mdat under an intact moov yields exactly the
  * fully-present leading samples. */
class Mp4ContainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def beInt(b: Array[Byte], pos: Int): Int =
    java.nio.ByteBuffer.wrap(b, pos, 4).getInt

  /** Formula twin of the walker's output for one id:
    * (sample_idx, offset, size, dts, is_sync, timescale). */
  private def expected(id: Long): Seq[(Long, Long, Long, Long, Boolean, Long)] = {
    val k = MultimodalOps.synthMp4Samples(id)
    val sizes = (0 until k).map(i => MultimodalOps.synthMp4SampleSize(id, i).toLong)
    val c1 = (k + 1) / 2
    val gap = MultimodalOps.synthMp4Gap(id).toLong
    val delta = MultimodalOps.synthMp4Delta(id).toLong
    val ts = MultimodalOps.synthMp4Timescale(id).toLong
    (0 until k).map { i =>
      val off = 32L + sizes.take(i).sum + (if (i >= c1) gap else 0L)
      (i.toLong, off, sizes(i), i * delta, i % 3 == 0, ts)
    }
  }

  private def walk(rows: Seq[(Long, Array[Byte])]) =
    MultimodalOps.mp4SampleTable(rows.toDF("id", "content"), "content", "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  private def encode(ids: Seq[Long], faststart: Boolean = false) =
    MultimodalOps.encodeSyntheticMp4(ids.toDF("id"), "id", faststart)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  // ids chosen to cover stco (even) vs co64 (odd) and mdhd v0 vs v1 (3 mod 4)
  private val CoverIds = Seq(2L, 3L, 4L, 7L)

  test("sample table == encoder formulas across stco/co64 and mdhd v0/v1") {
    val clips = encode(CoverIds)
    val got = walk(CoverIds.map(i => i -> clips(i)))
    CoverIds.foreach { id =>
      assert(got.get(id).contains(expected(id)), s"id=$id")
    }
  }

  test("faststart (moov-first) layout resolves identically") {
    val fs = encode(CoverIds, faststart = true)
    val got = walk(CoverIds.map(i => i -> fs(i)))
    CoverIds.foreach { id =>
      // the moov shift moves mdat, so offsets differ by the moov size —
      // everything else (sizes, dts, sync, timescale) must be identical,
      // and offsets must shift by one constant
      val exp = expected(id)
      val g = got(id)
      assert(g.size == exp.size, s"id=$id")
      val shifts = g.zip(exp).map { case (a, b) => a._2 - b._2 }.distinct
      assert(shifts.size == 1 && shifts.head > 0, s"id=$id: $shifts")
      assert(g.map(x => (x._1, x._3, x._4, x._5, x._6)) ==
        exp.map(x => (x._1, x._3, x._4, x._5, x._6)), s"id=$id")
    }
  }

  test("truncation sweep over a faststart clip: every cut yields exactly " +
    "the fully-present sample prefix, and never throws") {
    val id = 6L
    val bytes = encode(Seq(id), faststart = true)(id)
    assert(new String(bytes, 28, 4, "US-ASCII") == "moov")
    val moovEnd = 24 + beInt(bytes, 24)
    // offsets in the faststart layout = formula offsets + moov size
    val full = expected(id).map(e => (e._1, e._2 + (moovEnd - 24), e._3))
    val cuts = (0 to bytes.length).map(c => c.toLong -> bytes.take(c))
    val got = walk(cuts) // one job; absent key = zero rows for that cut
    cuts.foreach { case (cut, _) =>
      val exp = if (cut < moovEnd) Nil
      else full.takeWhile { case (_, off, sz) => off + sz <= cut }
        .map(_._1)
      assert(got.getOrElse(cut, Nil).map(_._1) == exp,
        s"cut=$cut moovEnd=$moovEnd")
    }
    // and the sweep genuinely exercised partial keeps
    val sizes = full.map(_._1).size
    assert(got.values.map(_.size).toSet.size > 2 &&
      got.values.exists(v => v.nonEmpty && v.size < sizes))
  }

  test("camera layout (moov last): a truncated tail loses the sample " +
    "table entirely — no rows, honestly") {
    val id = 5L
    val bytes = encode(Seq(id))(id)
    val cut = bytes.take(bytes.length - 10)
    assert(walk(Seq(id -> cut)).isEmpty)
  }

  test("a trak without stss is all-sync, per the spec default") {
    val id = 2L
    val bytes = encode(Seq(id))(id).clone()
    // patch the stss box's fourcc to 'free': sizes stay valid, the
    // walker just no longer finds a sync table
    val pos = (0 until bytes.length - 4).find(p =>
      new String(bytes, p, 4, "US-ASCII") == "stss").get
    "free".getBytes("US-ASCII").copyToArray(bytes, pos)
    val got = walk(Seq(id -> bytes))(id)
    assert(got.size == MultimodalOps.synthMp4Samples(id))
    assert(got.forall(_._5), "every sample must be sync without stss")
  }

  test("byte-flip fuzz never escapes as an exception") {
    val id = 3L
    val bytes = encode(Seq(id))(id)
    val flipped = (0 until bytes.length).map { p =>
      val b = bytes.clone(); b(p) = (b(p) ^ 0xFF).toByte
      p.toLong -> b
    }
    val got = walk(flipped) // completing the job IS the assertion
    assert(got.size <= flipped.size)
  }

  test("MP4 frame demux == frame-pack walk on the same clips " +
    "(third container grammar, one video)") {
    val ids = Seq(3L, 5L, 6L, 11L).toDF("id")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
    val viaMp4 = keyed(MultimodalOps.sampleMp4Frames(
      MultimodalOps.encodeSyntheticMp4Video(ids, "id"), "content",
      "media_id", 2))
    val viaPack = keyed(MultimodalOps.sampleFrames(
      MultimodalOps.encodeSyntheticFramePack(ids, "id"), "content",
      "media_id", 2))
    assert(viaMp4.nonEmpty && viaMp4 == viaPack)
  }

  test("non-MP4 payloads yield no rows") {
    val junk = Seq(
      1L -> Array.empty[Byte],
      2L -> "not an mp4 at all, definitely".getBytes("US-ASCII"),
      3L -> Array.fill(64)(0x41.toByte))
    assert(walk(junk).isEmpty)
  }
}
