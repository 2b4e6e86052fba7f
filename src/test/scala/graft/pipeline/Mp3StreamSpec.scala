package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame-stream walk: self-synchronizing variable-length
  * frames (lengths from each frame's own header), ID3v2 syncsafe skip,
  * CBR/VBR verdicts, and honest truncation at the last complete
  * frame. */
class Mp3StreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def encode(ids: Seq[Long]) =
    MultimodalOps.encodeSyntheticMp3(ids.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  private def walk(rows: Seq[(Long, Array[Byte])]) =
    MultimodalOps.mp3Meta(rows.toDF("id", "content"), "content", "id")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("stream facts == formulas: CBR and VBR, mono and stereo, " +
    "with and without ID3v2") {
    // 5 has ID3 (5%5==0) and is mono; 4 is VBR (4%4==0) with ID3 absent;
    // 0 is VBR with ID3; 7 is plain CBR stereo... per the formulas
    val ids = Seq(0L, 4L, 5L, 7L)
    val got = walk(encode(ids).toSeq)
    ids.foreach { id =>
      val r = got(id)
      assert(r.getLong(1) == MultimodalOps.synthMp3Frames(id), s"id=$id frames")
      assert(r.getLong(2) == MultimodalOps.synthMp3Frames(id) * 1152L)
      assert(r.getLong(4) == MultimodalOps.synthMp3Channels(id), s"id=$id ch")
      assert(r.getBoolean(7) == MultimodalOps.synthMp3IsVbr(id), s"id=$id vbr")
      if (!MultimodalOps.synthMp3IsVbr(id))
        assert(r.getLong(5) == r.getLong(6), s"id=$id CBR must have min==max")
      else assert(r.getLong(5) < r.getLong(6), s"id=$id VBR envelope")
    }
  }

  test("truncation ends the walk at the last complete frame") {
    val id = 7L // CBR, no ID3: every frame the same length
    val bytes = encode(Seq(id))(id)
    val k = MultimodalOps.synthMp3Frames(id)
    val frameLen = bytes.length / k // CBR with alternating padding: avg —
    // cut 5 bytes into the stream's final frame instead: drop 5 bytes
    val cut = bytes.take(bytes.length - 5)
    val got = walk(Seq(id -> cut))(id)
    assert(got.getLong(1) == k - 1L,
      s"expected ${k - 1} complete frames, got ${got.getLong(1)}")
    assert(frameLen > 4) // sanity: frames are real-sized
  }

  test("garbage, empty, and sync-less payloads yield no rows") {
    val junk = Seq(
      1L -> Array.empty[Byte],
      2L -> "definitely not mpeg audio data".getBytes("US-ASCII"),
      3L -> Array.fill(64)(0x00.toByte))
    assert(walk(junk).isEmpty)
  }

  test("a corrupt mid-stream header keeps the leading frames only") {
    val id = 11L
    val bytes = encode(Seq(id))(id).clone()
    // find the 3rd frame's offset by walking lengths like the encoder
    var p = 0
    (0 until 3).foreach(i => p += MultimodalOps.synthMp3FrameLen(id, i))
    bytes(p) = 0x00.toByte // destroy frame 3's sync byte
    val got = walk(Seq(id -> bytes))(id)
    assert(got.getLong(1) == 3L, s"expected 3 frames, got ${got.getLong(1)}")
  }

  test("truncation sweep: EVERY cut yields exactly the frames fully " +
    "before it, and never throws") {
    val id = 11L // CBR, no ID3 — per-frame lengths from the formulas
    val bytes = encode(Seq(id))(id)
    val k = MultimodalOps.synthMp3Frames(id)
    val ends = (0 until k).scanLeft(0)(
      (p, i) => p + MultimodalOps.synthMp3FrameLen(id, i)).drop(1)
    assert(ends.last == bytes.length)
    val cuts = (0 to bytes.length).map(c => c.toLong -> bytes.take(c))
    val got = walk(cuts) // one job; absent key = no row for that cut
    cuts.foreach { case (cut, _) =>
      val expFrames = ends.count(_ <= cut)
      got.get(cut) match {
        case None => assert(expFrames == 0, s"cut=$cut lost $expFrames frames")
        case Some(r) => assert(r.getLong(1) == expFrames.toLong,
          s"cut=$cut: got ${r.getLong(1)}, expected $expFrames")
      }
    }
  }

  test("byte-flip fuzz never escapes as an exception") {
    val id = 5L // has the ID3 tag — flips hit the syncsafe length too
    val bytes = encode(Seq(id))(id)
    // every 7th position (coprime with the 4-byte header stride, so
    // every header byte role gets hit) keeps the sweep's coverage at a
    // fraction of the data volume of an all-positions sweep
    val flipped = (0 until bytes.length by 7).map { p =>
      val b = bytes.clone(); b(p) = (b(p) ^ 0xFF).toByte
      p.toLong -> b
    }
    val got = walk(flipped)
    assert(got.size <= flipped.size) // completing the job IS the assertion
  }
}
