package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WEBP columnar metadata: all three variant headers round-trip, and
  * everything that is not a complete variant header is loud-false —
  * swept at every truncation point per variant. */
class WebpMetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def meta(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("id", "content")
      .select(col("id"), MultimodalOps.webpMeta(col("content")).as("m"))
      .select(col("id"), col("m.*"))
      .collect().map(r => r.getLong(0) -> r).toMap

  private def encode(ids: Seq[Long]) =
    MultimodalOps.encodeSyntheticWebp(ids.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("all three variants round-trip the formulas") {
    val ids = Seq(3L, 6L, 7L, 11L, 13L, 14L) // two of each variant
    val got = meta(encode(ids).toSeq)
    ids.foreach { id =>
      val r = got(id)
      assert(r.getBoolean(2), s"id=$id format_ok")
      val variant = Seq("lossy", "lossless", "extended")(
        MultimodalOps.synthWebpVariant(id))
      assert(r.getString(3) == variant, s"id=$id variant")
      assert(r.getLong(4) == MultimodalOps.synthWebpWidth(id), s"id=$id w")
      assert(r.getLong(5) == MultimodalOps.synthWebpHeight(id), s"id=$id h")
      assert(r.getBoolean(6) == MultimodalOps.synthWebpAlpha(id), s"id=$id a")
    }
  }

  test("truncation sweep per variant: every cut below the header's " +
    "minimum is loud-false, every cut past it parses") {
    // minimum complete-header lengths: lossy 30 (sync + dims),
    // lossless 25 (packed word), extended 30 (both canvas fields)
    for ((id, minLen) <- Seq((6L, 30), (7L, 25), (14L, 30))) {
      val bytes = encode(Seq(id))(id)
      val cuts = (0 to bytes.length).map(c => c.toLong -> bytes.take(c))
      val got = meta(cuts)
      cuts.foreach { case (cut, _) =>
        val r = got(cut)
        if (cut < minLen)
          assert(!r.getBoolean(2), s"id=$id cut=$cut must not parse")
        else {
          assert(r.getBoolean(2), s"id=$id cut=$cut must parse")
          assert(r.getLong(4) == MultimodalOps.synthWebpWidth(id))
        }
      }
    }
  }

  test("non-WEBP and corrupt payloads are loud-false") {
    val good = encode(Seq(6L))(6L)
    val badSync = good.clone(); badSync(23) = 0x00 // break the VP8 sync code
    val avi = MultimodalOps.encodeSyntheticAvi(Seq(2L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1) // RIFF but not WEBP
    val bad = Seq(1L -> Array.empty[Byte],
      2L -> "RIFFnope".getBytes("US-ASCII"),
      3L -> badSync, 4L -> avi)
    val got = meta(bad)
    bad.foreach { case (id, _) =>
      assert(!got(id).getBoolean(2), s"id=$id must not parse as WEBP")
      assert(got(id).isNullAt(4), s"id=$id width must be null")
    }
  }
}
