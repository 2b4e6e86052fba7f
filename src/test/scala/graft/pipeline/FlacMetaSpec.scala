package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FLAC STREAMINFO fixed-offset parse: formula round-trip including the
  * 36-bit total-samples field past 2^33, and the loud-false paths for
  * everything that is not a spec-layout FLAC head. */
class FlacMetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def meta(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("id", "content")
      .select(col("id"), MultimodalOps.flacMeta(col("content")).as("m"))
      .select(col("id"), col("m.*"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("round-trip == formulas, including a 36-bit sample count") {
    val ids = Seq(2L, 3L, 5L, 10L) // 5 and 10 cross 2^33 (id % 5 == 0)
    val clips = MultimodalOps.encodeSyntheticFlac(ids.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toSeq
    val got = meta(clips)
    ids.foreach { id =>
      val r = got(id)
      assert(r.getBoolean(2), s"id=$id format_ok")
      assert(r.getLong(3) == MultimodalOps.synthFlacChannels(id))
      assert(r.getLong(4) == MultimodalOps.synthFlacSampleRate(id))
      assert(r.getLong(5) == MultimodalOps.synthFlacBits(id))
      assert(r.getLong(6) == MultimodalOps.synthFlacTotalSamples(id))
      val md5 = (0 until 16)
        .map(j => f"${MultimodalOps.synthFlacMd5Byte(id, j)}%02X").mkString
      assert(r.getString(7) == md5, s"id=$id md5")
    }
    assert(got(5L).getLong(6) > (1L << 33), "planted 36-bit count")
  }

  test("truncation sweep: every cut below the 42-byte STREAMINFO head " +
    "is loud-false; every cut at or past it parses the full fields") {
    val id = 7L
    val bytes = MultimodalOps.encodeSyntheticFlac(Seq(id).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val cuts = (0 to bytes.length).map(c => c.toLong -> bytes.take(c))
    val got = meta(cuts)
    cuts.foreach { case (cut, _) =>
      val r = got(cut)
      if (cut < 42) {
        assert(!r.getBoolean(2), s"cut=$cut must not parse")
        assert(r.isNullAt(6), s"cut=$cut fields must be null")
      } else {
        assert(r.getBoolean(2), s"cut=$cut must parse (fixed offsets)")
        assert(r.getLong(1) == cut, s"cut=$cut n_bytes")
        assert(r.getLong(6) == MultimodalOps.synthFlacTotalSamples(id))
      }
    }
  }

  test("non-FLAC payloads are format_ok = false with null fields") {
    val wav = MultimodalOps.encodeSyntheticWav(Seq(4L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val flac = MultimodalOps.encodeSyntheticFlac(Seq(4L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    // a PADDING-first layout violates STREAMINFO-must-be-first
    val padFirst = flac.clone(); padFirst(4) = 0x01.toByte
    val bad = Seq(
      1L -> wav,
      2L -> flac.take(30),                      // truncated head
      3L -> "fLaCnope".getBytes("US-ASCII"),
      4L -> padFirst,
      5L -> Array.empty[Byte])
    val got = meta(bad)
    bad.foreach { case (id, _) =>
      val r = got(id)
      assert(!r.getBoolean(2), s"id=$id must not parse as FLAC")
      assert(r.isNullAt(4) && r.isNullAt(6), s"id=$id fields must be null")
    }
  }
}
