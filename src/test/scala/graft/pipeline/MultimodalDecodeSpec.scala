package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec coverage for the ImageIO-backed decode/resize path: the
  * encode→decode round-trip must be pixel-exact for PNG, dimension-exact
  * for (lossy) JPEG, and fail soft on non-image bytes. */
class MultimodalDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthetic PNG round-trips through the real encoder+decoder pixel-exactly") {
    val ids = Seq(0L, 1L, 7L, 41L, 123L).toDF("doc_id")
    val png = MultimodalOps.encodeSyntheticPng(ids, "doc_id")
    val got = MultimodalOps.decodeImageFeatures(png, "content", "media_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 41L, 123L)) {
      val (w, h) = MultimodalOps.synthDims(id)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = MultimodalOps.synthRgb(id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val r = got(id)
      assert(r.getBoolean(1), s"id=$id decode_ok")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"id=$id dims")
      assert(r.getLong(4) == w.toLong * h, s"id=$id n_px")
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((sr, sg, sb)),
        s"id=$id pixel sums")
      assert(r.getLong(8) == sr * 1000L / (w.toLong * h), s"id=$id mean")
    }
  }

  test("aHash: formula parity, identical payloads collide, uniform image " +
    "hashes to zero, retouched copy stays close") {
    def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // two identical gradient payloads, one near-copy (one pixel nudged),
    // one uniform image, one undecodable payload
    def grad(x: Int, y: Int): Int = ((x * 3) << 16) | ((y * 5) << 8) | 40
    val gradBytes = pngBytes(40, 24)(grad)
    val nearBytes = pngBytes(40, 24)((x, y) =>
      if (x == 0 && y == 0) grad(x, y) ^ 1 else grad(x, y))
    val flatBytes = pngBytes(16, 16)((_, _) => 0x123456)
    val df = Seq(
      (1L, gradBytes), (2L, gradBytes), (3L, nearBytes),
      (4L, flatBytes), (5L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val got = MultimodalOps.imageAHash(df, "content", "media_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent arithmetic over the raw formula
    def jvmAHash(w: Int, h: Int, rgb: (Int, Int) => Int): (Long, Long) = {
      val v = new Array[Long](64); val n = new Array[Long](64); var g = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = rgb(x, y)
        val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        val idx = y * 8 / h * 8 + x * 8 / w
        v(idx) += gray; n(idx) += 1; g += gray
      }
      val npx = w.toLong * h
      var a = 0L; var b = 0L
      for (i <- 0 until 64) {
        val bit = if (n(i) > 0 && v(i) * npx > g * n(i)) 1L else 0L
        if (i < 32) a |= bit << i else b |= bit << (i - 32)
      }
      (a, b)
    }
    val expected = jvmAHash(40, 24, grad)
    assert((got(1L).getLong(2), got(1L).getLong(3)) == expected)
    // identical payloads → identical hashes
    assert((got(2L).getLong(2), got(2L).getLong(3)) ==
      ((got(1L).getLong(2), got(1L).getLong(3))))
    // a one-pixel retouch keeps the hash (cell means barely move)
    assert((got(3L).getLong(2), got(3L).getLong(3)) ==
      ((got(1L).getLong(2), got(1L).getLong(3))))
    // uniform image: no cell strictly exceeds the global mean → all zero
    assert((got(4L).getLong(2), got(4L).getLong(3)) == ((0L, 0L)))
    // and the gradient is not degenerate
    assert(got(1L).getLong(2) != 0L || got(1L).getLong(3) != 0L)
    assert(!got(5L).getBoolean(1) && got(5L).isNullAt(2) && got(5L).isNullAt(3))
  }

  test("real JPEG decode recovers dimensions (lossy - sums not asserted)") {
    // encode a small image as real JPEG via the JDK writer
    val img = new java.awt.image.BufferedImage(
      20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20) img.setRGB(x, y, (x * 13 + y) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("media_id", "content")
    val r = MultimodalOps.decodeImageFeatures(df, "content", "media_id").collect()(0)
    assert(r.getBoolean(1) && r.getLong(2) == 20L && r.getLong(3) == 12L)
    assert(r.getLong(4) == 240L)
  }

  test("non-image bytes fail soft: decode_ok=false, null features") {
    val df = Seq((9L, "definitely not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val r = MultimodalOps.decodeImageFeatures(df, "content", "media_id").collect()(0)
    assert(!r.getBoolean(1))
    (2 to 8).foreach(i => assert(r.isNullAt(i), s"field $i"))
  }

  test("real resize: nearest-neighbor downscale, pass-through within bound") {
    val src = new java.awt.image.BufferedImage(
      64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64)
      src.setRGB(x, y, ((x * 3) << 16) | ((y * 7) << 8) | ((x + y) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val df = Seq((5L, bos.toByteArray)).toDF("media_id", "content")

    val small = MultimodalOps.resizeImages(df, "content", "media_id", 16L).collect()(0)
    assert(small.getLong(2) == 16L && small.getLong(3) == 8L)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small.getAs[Array[Byte]](1)))
    assert(back.getWidth == 16 && back.getHeight == 8)
    // nearest neighbor: dest (x,y) samples source (x*64/16, y*32/8)
    for (y <- 0 until 8; x <- 0 until 16)
      assert((back.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(x * 4, y * 4) & 0xffffff), s"($x,$y)")

    val same = MultimodalOps.resizeImages(df, "content", "media_id", 256L).collect()(0)
    assert(same.getLong(2) == 64L && same.getLong(3) == 32L)
    assert(same.getAs[Array[Byte]](1).sameElements(bos.toByteArray),
      "within-bound image must pass through byte-identical")

    val garbage = Seq((6L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    val g = MultimodalOps.resizeImages(garbage, "content", "media_id", 16L).collect()(0)
    assert(g.isNullAt(2) && g.isNullAt(3))
    assert(g.getAs[Array[Byte]](1).sameElements(Array[Byte](1, 2, 3)))
  }
}
