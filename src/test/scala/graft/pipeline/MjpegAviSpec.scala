package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Motion-JPEG in RIFF/AVI — the first LOSSY codec through the demuxer
  * seam. The container walk and the real ImageIO decode are the
  * Motion-PNG leg's, unchanged; what changes is the ground truth:
  * decoded pixel sums are JPEG-quantization facts, so the formula
  * oracle covers dims/count/order and THIS spec pins the rest —
  * demuxed-and-decoded sums must equal an independent decode of the
  * same JPEG bytes (proving the walk slices exactly the encoded
  * payloads), and the payloads must genuinely be JPEG, not PNG. */
class MjpegAviSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L, 6L, 9L)

  private def encodeFrameJpeg(fid: Long): Array[Byte] = {
    val (w, h) = MultimodalOps.synthDims(fid)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, MultimodalOps.synthRgb(fid, x, y)); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def decodeSums(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
        x += 1
      }
      y += 1
    }
    (w.toLong, h.toLong, sr, sg, sb)
  }

  test("demuxed MJPEG frames decode to the same sums as the raw JPEG bytes") {
    val avis = MultimodalOps.encodeSyntheticAvi(
      ids.toDF("id"), "id", codec = "MJPG")
    val got = MultimodalOps.sampleAviFrames(avis, "content", "media_id", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    val expected = (for {
      id <- ids
      j <- 0 until MultimodalOps.synthFrameCount(id) if j % 2 == 0
    } yield (id, j.toLong) ->
      decodeSums(encodeFrameJpeg(MultimodalOps.synthFrameImageId(id, j)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // the lossy part is REAL: at least one frame's decoded sums differ
    // from the pre-compression formula raster (otherwise this leg would
    // silently be testing a lossless path again)
    val lossless = expected.count { case ((id, j), (_, _, sr, sg, sb)) =>
      val fid = MultimodalOps.synthFrameImageId(id, j.toInt)
      val (w, h) = MultimodalOps.synthDims(fid)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val px = MultimodalOps.synthRgb(fid, x, y)
        er += (px >> 16) & 0xff; eg += (px >> 8) & 0xff; eb += px & 0xff
      }
      (sr, sg, sb) == ((er, eg, eb))
    }
    assert(lossless < expected.size,
      "JPEG coding should not be byte-lossless on the formula rasters")
  }

  test("the chunks genuinely carry JPEG, and the headers declare MJPG") {
    val bytes = MultimodalOps.encodeSyntheticAvi(
      Seq(2L).toDF("id"), "id", codec = "MJPG")
      .collect()(0).getAs[Array[Byte]](1)
    val s = bytes.map(_ & 0xFF)
    // strh/strf carry the MJPG fourcc somewhere in the header region
    val txt = new String(bytes.take(200), "ISO-8859-1")
    assert(txt.contains("MJPG") && !txt.contains("MPNG"))
    // first '00dc' chunk payload starts with the JPEG SOI marker, and
    // no PNG signature appears anywhere
    val dc = txt.indexOf("00dc")
    val moviTxt = new String(bytes, "ISO-8859-1")
    val firstDc = moviTxt.indexOf("00dc")
    assert(firstDc > 0)
    assert(s(firstDc + 8) == 0xFF && s(firstDc + 9) == 0xD8, // SOI
      "MJPG chunk payload must start with the JPEG SOI marker")
    assert(!moviTxt.contains("PNG"))
  }

  test("the MPNG default is unchanged (regression guard on the codec seam)") {
    val png = MultimodalOps.encodeSyntheticAvi(Seq(2L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val txt = new String(png, "ISO-8859-1")
    assert(txt.contains("MPNG") && txt.contains("PNG"))
  }
}
