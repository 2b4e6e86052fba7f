package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-modal pair miner: tag extraction (multiple tags, empty
  * alt, tagless pages), dangling-reference drops, undecodable-payload
  * drops, duplicate-URI multiplication (the documented contract), and
  * the paired-crawl generator formulas it mines in production. */
class ImageTextPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def png(key: Long): Array[Byte] = {
    val df = Seq(key).toDF("k")
    MultimodalOps.encodeSyntheticPng(df, "k")
      .select("content").collect()(0).getAs[Array[Byte]](0)
  }

  private def run(pages: Seq[(String, String)],
                  images: Seq[(Long, String, Array[Byte])]) =
    MultimodalOps.imageTextPairs(
      pages.toDF("page_uri", "html"),
      "page_uri", "html",
      images.toDF("pk", "img_uri", "content"),
      "pk", "img_uri", "content")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  test("mines (page, image, alt) per resolved tag; dangling refs and " +
    "tagless pages drop; empty alt survives") {
    val pages = Seq(
      ("p://a", """<html><body><img src="i://1" alt="a cat"/>""" +
        """<img src="i://2" alt=""/><img src="i://missing" alt="x"/>""" +
        "</body></html>"),
      ("p://b", """<html><body><img src="i://1" alt="same image"/>""" +
        "</body></html>"),
      ("p://c", "<html><body>no tags here</body></html>"))
    val images = Seq((1L, "i://1", png(3L)), (2L, "i://2", png(4L)))
    val got = run(pages, images)
    assert(got == Set(
      ("p://a", "i://1", "a cat"),
      ("p://a", "i://2", ""),
      ("p://b", "i://1", "same image")))
  }

  test("an undecodable image payload drops its pairs (decode_ok gate)") {
    val pages = Seq(
      ("p://a", """<html><body><img src="i://ok" alt="fine"/>""" +
        """<img src="i://bad" alt="broken"/></body></html>"""))
    val images = Seq((1L, "i://ok", png(5L)),
      (2L, "i://bad", "not a png at all".getBytes("UTF-8")))
    assert(run(pages, images) == Set(("p://a", "i://ok", "fine")))
  }

  test("fingerprints ride the pair: identical images at different URIs " +
    "carry the same (ahash_a, ahash_b)") {
    val pages = Seq(
      ("p://a", """<html><body><img src="i://1" alt="x"/>""" +
        """<img src="i://2" alt="y"/><img src="i://3" alt="z"/>""" +
        "</body></html>"))
    val images = Seq((1L, "i://1", png(7L)), (2L, "i://2", png(7L)),
      (3L, "i://3", png(8L)))
    val rows = MultimodalOps.imageTextPairs(
        pages.toDF("page_uri", "html"), "page_uri", "html",
        images.toDF("pk", "img_uri", "content"), "pk", "img_uri",
        "content")
      .collect()
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows("i://1") == rows("i://2"))
    assert(rows("i://1") != rows("i://3"))
  }

  test("paired-crawl formulas: every page embeds its formula tags; the " +
    "reference graph crosses files and contains dangling edges") {
    val refsPerPage = for {
      id <- 0L until 40L
      r <- 0 until WarcOps.synthWarcResponses(id)
      if !WarcOps.synthWarcIsImage(id, r)
    } yield {
      val html = WarcOps.synthWarcHtmlPaired(id, r)
      val n = WarcOps.synthWarcImgRefCount(id, r)
      val tags = "<img src=".r.findAllIn(html).size
      assert(tags == n, s"($id,$r): $tags tags, formula says $n")
      (0 until n).map { j =>
        val (tid, tr) = WarcOps.synthWarcImgRefTarget(id, r, j)
        assert(html.contains(s"""src="http://example.test/$tid/$tr""""))
        assert(html.contains(WarcOps.synthWarcAlt(id, r, j)))
        (id, tid, tr)
      }
    }
    val flat = refsPerPage.flatten
    assert(flat.exists { case (id, tid, _) => tid != id },
      "the reference graph must cross files")
    val (resolved, dangling) = flat.partition { case (_, tid, tr) =>
      tr < WarcOps.synthWarcResponses(tid) &&
        WarcOps.synthWarcIsImage(tid, tr) &&
        WarcOps.synthWarcStatus(tid, tr) == 200
    }
    assert(resolved.nonEmpty && dangling.nonEmpty,
      s"need both edge kinds: ${resolved.size} resolved, " +
        s"${dangling.size} dangling")
  }
}
