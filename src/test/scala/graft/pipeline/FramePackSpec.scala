package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frame container: real walk, real per-frame decode, honest
  * degradation on malformed bytes. */
class FramePackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sampling keeps exactly the stride-aligned frames, pixels formula-exact") {
    val ids = Seq(5L, 6L).toDF("id") // k = 3 + id%4 -> 4 and 5 frames
    val packs = MultimodalOps.encodeSyntheticFramePack(ids, "id")
    val out = MultimodalOps.sampleFrames(packs, "content", "media_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // id 5: frames 0..3 -> sampled 0,2; id 6: frames 0..4 -> 0,2,4
    assert(out.keySet == Set((5L, 0L), (5L, 2L), (6L, 0L), (6L, 2L), (6L, 4L)))
    out.foreach { case ((id, j), (w, h, sr)) =>
      val fid = MultimodalOps.synthFrameImageId(id, j.toInt)
      val (ew, eh) = MultimodalOps.synthDims(fid)
      assert(w == ew && h == eh)
      val expSr = (for (x <- 0 until ew; y <- 0 until eh)
        yield ((MultimodalOps.synthRgb(fid, x, y) >> 16) & 0xff).toLong).sum
      assert(sr == expSr, s"id=$id j=$j")
    }
  }

  test("malformed containers emit no rows; truncation yields only complete frames") {
    val good = MultimodalOps.encodeSyntheticFramePack(Seq(5L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val junk = "not a container".getBytes("UTF-8")
    // cut inside the THIRD frame: frames 0 and 1 stay complete
    val firstLen = java.nio.ByteBuffer.wrap(good, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val secondLenPos = 8 + 4 + firstLen
    val secondLen = java.nio.ByteBuffer.wrap(good, secondLenPos, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val cut = good.take(secondLenPos + 4 + secondLen + 6)
    val df = Seq((1L, junk), (2L, cut)).toDF("media_id", "content")
    val out = MultimodalOps.sampleFrames(df, "content", "media_id", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!out.exists(_._1 == 1L))
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0L, 1L))
  }
}
