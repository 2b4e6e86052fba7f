package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingestion + HTML text extraction: record recovery against the
  * generator formulas, honest truncation (every cut keeps a PREFIX of
  * fully-delimited records), malformed-payload accounting, and the
  * entity-decode ordering trap. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L, 5L, 12L)

  private def parse(df: org.apache.spark.sql.DataFrame,
                    acc: Option[org.apache.spark.util.LongAccumulator] = None) =
    WarcOps.warcRecords(df, "content", "media_id", acc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.toString), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.toString)))
      .sortBy(t => (t._1, t._2))

  test("records round-trip the generator formulas exactly") {
    val got = parse(WarcOps.encodeSyntheticWarc(ids.toDF("id"), "id"))
    val expected = ids.sorted.flatMap { id =>
      val info = (id, 0L, "warcinfo", None, s"software: graft-$id".length + 2L,
        None, Some(s"software: graft-$id\r\n"))
      val rsp = (0 until WarcOps.synthWarcResponses(id)).map { r =>
        val html = WarcOps.synthWarcHtml(id, r)
        val st = WarcOps.synthWarcStatus(id, r).toLong
        val payLen = s"HTTP/1.1 $st X\r\nContent-Type: text/html\r\n\r\n".length +
          html.length
        (id, r + 1L, "response", Some(s"http://example.test/$id/$r"),
          payLen.toLong, Some(st), Some(html))
      }
      info +: rsp
    }
    assert(got.toSeq == expected)
  }

  test("truncation at every cut keeps a prefix of fully-delimited records") {
    for (id <- Seq(2L, 3L)) {
      val full = WarcOps.encodeSyntheticWarc(Seq(id).toDF("id"), "id")
        .collect()(0).getAs[Array[Byte]](1)
      val whole = parse(Seq((id, full)).toDF("media_id", "content")).toSeq
      var prevCount = 0
      for (cut <- (0 to full.length by 7) :+ full.length) { // strided + final
        val part = java.util.Arrays.copyOf(full, cut)
        val got = parse(Seq((id, part)).toDF("media_id", "content")).toSeq
        assert(got == whole.take(got.length), s"id $id cut $cut not a prefix")
        assert(got.length >= prevCount, s"id $id cut $cut lost records")
        prevCount = got.length
      }
      assert(prevCount == whole.length)
    }
  }

  test("non-WARC payloads are counted, valid files flow through") {
    val acc = spark.sparkContext.longAccumulator("warc-acct-test")
    val mixed = WarcOps.encodeSyntheticWarc(ids.toDF("id"), "id")
      .unionByName(Seq(
        (900L, "not a warc at all".getBytes("ISO-8859-1")),
        (901L, "WARC/1.0\r\nContent-Length: zz\r\n\r\n".getBytes("ISO-8859-1")))
        .toDF("media_id", "content"))
    val rows = WarcOps.warcRecords(mixed, "content", "media_id", Some(acc))
      .collect()
    assert(acc.value == 2L)
    assert(rows.map(_.getLong(0)).toSet == ids.toSet)
  }

  test("a non-numeric Content-Length mid-file keeps the parsed prefix " +
    "(same discipline as a cut-short payload, not a whole-file drop)") {
    val id = 2L
    val full = WarcOps.encodeSyntheticWarc(Seq(id).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val whole = parse(Seq((id, full)).toDF("media_id", "content")).toSeq
    assert(whole.length >= 3)
    // graft a malformed record between the first two good ones and the rest
    val s = new String(full, "ISO-8859-1")
    // start of record 3 = after the 2nd record's trailing \r\n\r\n
    var p = 0
    for (_ <- 0 until 2) p = s.indexOf("WARC/1.0", p + 1)
    val badRec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 12x34\r\n\r\npayload\r\n\r\n"
    val spliced = (s.substring(0, p) + badRec + s.substring(p))
      .getBytes("ISO-8859-1")
    val acc = spark.sparkContext.longAccumulator("warc-cl-acct")
    val got = parse(Seq((id, spliced)).toDF("media_id", "content"),
      Some(acc)).toSeq
    assert(got == whole.take(2),
      s"records before the malformed one must survive: got ${got.length}")
    assert(acc.value == 0L, "a file that yielded records is not tallied")
    // the same malformation on the FIRST record yields nothing — counted
    val acc2 = spark.sparkContext.longAccumulator("warc-cl-acct-2")
    val noneGot = parse(Seq((id, (badRec + s).getBytes("ISO-8859-1")))
      .toDF("media_id", "content"), Some(acc2))
    assert(noneGot.isEmpty && acc2.value == 1L)
  }

  test("member-per-record gzip storage parses to the identical records") {
    val plain = parse(WarcOps.encodeSyntheticWarc(ids.toDF("id"), "id")).toSeq
    val gz = WarcOps.warcRecordsGz(
      WarcOps.encodeSyntheticWarcGz(ids.toDF("id"), "id"),
      "content", "media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.toString), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.toString)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(gz == plain && gz.nonEmpty)
    // the storage really is multi-member gzip: more than one member
    // magic in one file
    val bytes = WarcOps.encodeSyntheticWarcGz(Seq(2L).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val members = bytes.sliding(2).count(a =>
      (a(0) & 0xFF) == 0x1F && (a(1) & 0xFF) == 0x8B)
    assert(members >= 1 + WarcOps.synthWarcResponses(2L))
    // corrupt gzip framing is DATA: counted, not query-failing
    val acc = spark.sparkContext.longAccumulator("warc-gz-acct")
    val rows = WarcOps.warcRecordsGz(
      WarcOps.encodeSyntheticWarcGz(ids.toDF("id"), "id").unionByName(
        Seq((902L, Array.fill[Byte](40)(0x55))).toDF("media_id", "content")),
      "content", "media_id", Some(acc)).collect()
    assert(acc.value == 1L)
    assert(!rows.map(_.getLong(0)).contains(902L))
  }

  test("urlCanonical: case, default ports, fragments — and nothing else") {
    val got = Seq(
      "HTTP://Example.COM:80/Path/X?Q=Mixed#frag",
      "https://A.B:443/",
      "https://a.b:8443/x",          // NON-default port survives
      "http://h/p?q=1",              // already canonical
      "ftp://H:80/x",                // foreign scheme: port untouched
      "not a url at all")
      .toDF("u").select(WarcOps.urlCanonical(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "http://example.com/Path/X?Q=Mixed", // path/query case preserved
      "https://a.b/",
      "https://a.b:8443/x",
      "http://h/p?q=1",
      "ftp://h:80/x",
      "not a url at all"))
  }

  test("htmlText strips, decodes in the right order, and collapses") {
    val got = Seq(
      "<p>a  b</p>",
      "x &amp;lt; y",          // must yield the LITERAL "&lt;", not "<"
      "<b>q&quot;s</b>\r\n<i>t&#39;u</i>",
      "a &lt;tag&gt; b")
      .toDF("h").select(WarcOps.htmlText(col("h")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a b", "x &lt; y", "q\"s t'u", "a <tag> b"))
  }
}
