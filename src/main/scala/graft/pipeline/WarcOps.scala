package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format web
  * crawls actually arrive in (Common Crawl et al.): a WARC file is a
  * concatenation of records, each a version line + named headers + a
  * Content-Length-delimited payload + a blank-line separator; response
  * records carry an HTTP message whose body is the document a text
  * pipeline wants.
  *
  * Scale shape: the parse is a single forward byte walk per file in
  * the `mapPartitions` slot — 1:1, partition-parallel, no shuffle —
  * and the output is a narrow per-record relation the documents
  * pipeline joins/filters before any body text is widened. Honest
  * truncation (the container-walk discipline): a cut mid-record keeps
  * every fully-delimited preceding record; unresolvable payloads are
  * counted by the shared tally, never silently dropped, and walker
  * bugs FAIL the query. Headers are parsed byte-preserving
  * (ISO-8859-1, 1 char = 1 byte) so Content-Length arithmetic is
  * exact; WARC's gzip-per-record storage compression is the file
  * layer's concern, not this parser's — feed it decompressed bytes. */
object WarcOps {

  /** Deterministic synthetic-WARC formulas, mirrored verbatim by the
    * oracle SQL (which rebuilds the same strings with concat and never
    * sees the parser). */
  def synthWarcResponses(id: Long): Int = (3 + id % 4).toInt
  def synthWarcWords(id: Long, r: Int): Int = (5 + (id + r) % 7).toInt
  def synthWarcStatus(id: Long, r: Int): Int =
    if ((id + r) % 5 == 0) 404 else 200

  /** The response body HTML for (id, r) — tags around formula words. */
  def synthWarcHtml(id: Long, r: Int): String = {
    val words = (0 until synthWarcWords(id, r))
      .map(k => s"w${id}_${r}_$k").mkString(" ")
    s"<html><head><title>t${id}_$r</title></head>" +
      s"<body><p>$words &amp; tail</p></body></html>"
  }

  /** One id's record strings, in file order — the ONE builder behind
    * both storage encoders (plain concatenation and gzip-per-member),
    * so the two corpora are byte-identical record for record. The
    * Record-ID salt is the running uncompressed length of the records
    * before this one. `response` supplies each response's
    * (content type, HTTP body); bodies are ISO-8859-1 strings, which
    * carry BINARY payloads byte-for-byte (1 char = 1 byte) — the media
    * encoder threads real PNG bytes through exactly this seam. */
  private def warcRecordsWith(id: Long,
      response: Int => (String, String),
      uriOf: (Long, Int) => String =
        (i, r) => s"http://example.test/$i/$r"): Seq[String] = {
    var runningLen = 0
    def record(tpe: String, uri: Option[String], payload: String): String = {
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $tpe\r\n")
      sb.append(s"WARC-Record-ID: <urn:graft:$id:$runningLen>\r\n")
      uri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
      sb.append(s"Content-Length: ${payload.length}\r\n")
      sb.append("\r\n").append(payload).append("\r\n\r\n")
      runningLen += sb.length
      sb.toString
    }
    record("warcinfo", None, s"software: graft-$id\r\n") +:
      (0 until synthWarcResponses(id)).map { ri =>
        val (ctype, body) = response(ri)
        val http = s"HTTP/1.1 ${synthWarcStatus(id, ri)} X\r\n" +
          s"Content-Type: $ctype\r\n\r\n" + body
        record("response", Some(uriOf(id, ri)), http)
      }
  }

  private def warcRecordStrings(id: Long): Seq[String] =
    warcRecordsWith(id, ri => ("text/html", synthWarcHtml(id, ri)))

  /** The MIXED-MODALITY crawl formulas: response r of file id is an
    * IMAGE iff (id + r) % 3 == 0, carrying the real PNG of formula
    * image (id·8 + r) % 40 — keys recur across files, so the corpus is
    * deliberately duplicate-rich (the dedup story's input). Text
    * responses are the html formulas unchanged. */
  def synthWarcIsImage(id: Long, r: Int): Boolean = (id + r) % 3 == 0
  def synthWarcImgKey(id: Long, r: Int): Long = (id * 8 + r) % 40

  private def warcRecordStringsMedia(id: Long): Seq[String] =
    warcRecordsWith(id, ri =>
      if (synthWarcIsImage(id, ri))
        ("image/png", new String(
          MultimodalOps.synthPngBytes(synthWarcImgKey(id, ri)),
          "ISO-8859-1"))
      else ("text/html", synthWarcHtml(id, ri)))

  /** The PAIRED-CRAWL formulas: text response (id, r) embeds
    * `synthWarcImgRefCount` `<img src alt>` tags, ref j of which
    * targets response `tr` of file `tid` — deliberately often a
    * DIFFERENT file (cross-page references are what make pair mining a
    * distributed join), and deliberately sometimes DANGLING (the
    * target is a text response, a 404, or past the target file's
    * response count) — a real crawl's `<img>` graph is full of broken
    * edges and the miner must drop them. Image responses are the
    * media-crawl formulas unchanged. */
  def synthWarcImgRefCount(id: Long, r: Int): Int = (1 + (id + r) % 2).toInt

  /** Ref j of text response (id, r) → (target file id, target response
    * index). */
  def synthWarcImgRefTarget(id: Long, r: Int, j: Int): (Long, Int) =
    ((id * 3 + r * 5 + j * 7) % 40, ((id + r + 2 * j) % 4).toInt)

  /** Ref j's alt text — the caption half of the mined pair. */
  def synthWarcAlt(id: Long, r: Int, j: Int): String =
    s"alt${id}_${r}_$j scene${(id + r + j) % 6}"

  /** Text response (id, r)'s HTML for the paired corpus: the plain
    * formula page plus its `<img>` tags before `</body>`. */
  def synthWarcHtmlPaired(id: Long, r: Int): String = {
    val imgs = (0 until synthWarcImgRefCount(id, r)).map { j =>
      val (tid, tr) = synthWarcImgRefTarget(id, r, j)
      s"""<img src="http://example.test/$tid/$tr" alt="${synthWarcAlt(id, r, j)}"/>"""
    }.mkString
    val base = synthWarcHtml(id, r)
    base.replace("</body>", s"$imgs</body>")
  }

  /** The LINKED-CRAWL formulas: pages live on formula HOSTS
    * ([[synthWarcHost]]) and text response (id, r) embeds
    * [[synthWarcLinkCount]] `<a href>anchor</a>` tags, link j of which
    * targets response `tr` of file `tid` ([[synthWarcLinkTarget]]) —
    * usually on a DIFFERENT host (cross-host edges are what give the
    * host graph structure) and deliberately sometimes DANGLING (an
    * index past the target's response count, or a 404 page): an
    * out-link is an EDGE whether or not its target was ever fetched,
    * which is exactly what a crawl frontier records. */
  def synthWarcHost(id: Long): String = s"h${id % 7}.test"
  def synthWarcLinkCount(id: Long, r: Int): Int = (1 + (id + r) % 3).toInt
  def synthWarcLinkTarget(id: Long, r: Int, j: Int): (Long, Int) =
    ((id * 5 + r * 3 + j * 11) % 40, ((id + 2 * r + j) % 4).toInt)
  def synthWarcAnchor(id: Long, r: Int, j: Int): String =
    s"a${id}_${r}_$j topic${(id + r + 2L * j) % 5}"

  /** Text response (id, r)'s HTML for the linked corpus: the plain
    * formula page plus its `<a href>` tags before `</body>`. */
  def synthWarcHtmlLinked(id: Long, r: Int): String = {
    val links = (0 until synthWarcLinkCount(id, r)).map { j =>
      val (tid, tr) = synthWarcLinkTarget(id, r, j)
      s"""<a href="http://${synthWarcHost(tid)}/$tid/$tr">${synthWarcAnchor(id, r, j)}</a>"""
    }.mkString
    synthWarcHtml(id, r).replace("</body>", s"$links</body>")
  }

  /** The linked-crawl corpus: text-only pages on formula hosts whose
    * HTML carries the `<a href>` out-link graph
    * ([[synthWarcHtmlLinked]]) — the link-graph miner's input. */
  def encodeSyntheticWarcGzLinked(df: DataFrame, idCol: String): DataFrame =
    encodeWarcGzWith(df, idCol)(id =>
      warcRecordsWith(id, ri => ("text/html", synthWarcHtmlLinked(id, ri)),
        (i, r) => s"http://${synthWarcHost(i)}/$i/$r"))

  private def warcRecordStringsPaired(id: Long): Seq[String] =
    warcRecordsWith(id, ri =>
      if (synthWarcIsImage(id, ri))
        ("image/png", new String(
          MultimodalOps.synthPngBytes(synthWarcImgKey(id, ri)),
          "ISO-8859-1"))
      else ("text/html", synthWarcHtmlPaired(id, ri)))

  /** id → one REAL multi-record WARC file: a warcinfo record followed
    * by `synthWarcResponses(id)` response records, each carrying a full
    * HTTP message (status line + headers + HTML body), CRLF discipline
    * and Content-Length byte counts exact. */
  def encodeSyntheticWarc(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        new GenericRowWithSchema(Array[Any](id,
          warcRecordStrings(id).mkString.getBytes("ISO-8859-1")),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** id → the SAME logical WARC as [[encodeSyntheticWarc]] but stored
    * the way Common Crawl actually ships it: ONE GZIP MEMBER PER
    * RECORD, members concatenated — the layout that lets a consumer
    * seek to a record boundary and decompress just that member. */
  def encodeSyntheticWarcGz(df: DataFrame, idCol: String): DataFrame =
    encodeWarcGzWith(df, idCol)(warcRecordStrings)

  /** [[encodeSyntheticWarcGz]] with the MIXED-MODALITY records: image
    * responses ([[synthWarcIsImage]]) carry real PNG bytes as their
    * HTTP payload, Content-Type image/png, everything else identical —
    * the crawl corpus a multimodal training pipeline actually faces. */
  def encodeSyntheticWarcGzMedia(df: DataFrame, idCol: String): DataFrame =
    encodeWarcGzWith(df, idCol)(warcRecordStringsMedia)

  /** The paired-crawl corpus: media files whose HTML pages carry the
    * `<img src alt>` reference graph ([[synthWarcHtmlPaired]]) — the
    * image-text pair miner's input. */
  def encodeSyntheticWarcGzPaired(df: DataFrame, idCol: String): DataFrame =
    encodeWarcGzWith(df, idCol)(warcRecordStringsPaired)

  private def encodeWarcGzWith(df: DataFrame, idCol: String)(
      strings: Long => Seq[String]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bos = new java.io.ByteArrayOutputStream()
        strings(id).foreach { rec =>
          val member = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(member)
          try { gz.write(rec.getBytes("ISO-8859-1")); gz.finish() }
          finally gz.close() // releases the native Deflater per member
          member.writeTo(bos)
        }
        new GenericRowWithSchema(Array[Any](id, bos.toByteArray),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** [[warcRecords]] over gzip-compressed WARC bytes (single-stream OR
    * the member-per-record concatenation — `GZIPInputStream` walks
    * concatenated members natively), decompressing inside the same
    * mapPartitions slot before the one-pass record walk. Corrupt gzip
    * framing is DATA (counted); output is identical to the
    * uncompressed form on the same logical records, so the query
    * shares its oracle. */
  def warcRecordsGz(df: DataFrame, contentCol: String, idCol: String,
                    unresolvedCounter: Option[
                      org.apache.spark.util.LongAccumulator] = None,
                    maxPlainBytes: Long = 1L << 30)
      : DataFrame = {
    val outSchema = WarcRecordSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "warcRecordsGz")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          // incremental decompression, two disciplines at once: a
          // TRUNCATED stream keeps every byte decoded before the
          // failure (so the record walk keeps the fully-delivered
          // leading records — the plain form's honest truncation), and
          // a decompression BOMB is cut at maxPlainBytes instead of
          // allocating toward an uncatchable OutOfMemoryError
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val acc = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 << 10)
          try {
            var going = true
            while (going) {
              val n = try gz.read(buf) catch {
                case _: java.io.IOException => -1 // keep the decoded prefix
              }
              if (n <= 0) going = false
              else {
                val room = maxPlainBytes - acc.size()
                acc.write(buf, 0, math.min(n.toLong, room).toInt)
                if (acc.size() >= maxPlainBytes) going = false
              }
            }
          } finally gz.close()
          parseOne(id, acc.toByteArray, outSchema)
        } catch {
          case _: java.io.IOException => Nil // corrupt leading gzip header: data
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** End of the gzip member HEADER starting at `p` (= start of the
    * deflate data), or −1 if the bytes at `p` are not a well-formed
    * gzip header. Handles the optional FEXTRA/FNAME/FCOMMENT/FHCRC
    * fields real crawls carry (Common Crawl members ship FNAME). */
  private def gzipHeaderEnd(b: Array[Byte], p: Int): Int = {
    if (p + 10 > b.length) return -1
    if ((b(p) & 0xFF) != 0x1F || (b(p + 1) & 0xFF) != 0x8B ||
        (b(p + 2) & 0xFF) != 8) return -1 // magic + deflate CM only
    val flg = b(p + 3) & 0xFF
    var q = p + 10
    if ((flg & 0x04) != 0) { // FEXTRA: LE u16 length + bytes
      if (q + 2 > b.length) return -1
      q += 2 + ((b(q) & 0xFF) | ((b(q + 1) & 0xFF) << 8))
    }
    if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
      while (q < b.length && b(q) != 0) q += 1
      q += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: NUL-terminated
      while (q < b.length && b(q) != 0) q += 1
      q += 1
    }
    if ((flg & 0x02) != 0) q += 2 // FHCRC
    if (q > b.length) -1 else q
  }

  /** The members of a CONCATENATED gzip, each with its exact byte
    * extent: (member_offset, member_length, plain_bytes) — the
    * boundary knowledge `GZIPInputStream` hides (it walks members
    * transparently) and the whole point of the .warc.gz layout: a
    * member's (offset, length) makes its record independently
    * fetchable later. Boundaries come from the Inflater's own
    * bytes-consumed accounting plus the fixed 8-byte CRC/ISIZE
    * trailer, and each member's trailer is VERIFIED (CRC32 + length
    * mod 2^32 over the decompressed bytes) — nearly free, catches
    * silent corruption, and makes a decode-from-here attempt a
    * cryptographic-strength boundary test for the sharded builder's
    * mid-file resync (a false 1f8b08 inside compressed payload decodes
    * to a mismatched trailer with probability ~2^-32). Honest
    * truncation: a malformed, cut-short, CRC-mismatched, or
    * over-`maxPlainBytes` (bomb) member ends the walk keeping every
    * complete member before it. */
  private[pipeline] def gzipMembers(b: Array[Byte], maxPlainBytes: Long)
      : Seq[(Long, Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Array[Byte])]
    var p = 0
    while (p < b.length) {
      val ds = gzipHeaderEnd(b, p)
      if (ds < 0) return out.toSeq
      val inf = new java.util.zip.Inflater(true) // raw deflate
      try {
        inf.setInput(b, ds, b.length - ds)
        val acc = new java.io.ByteArrayOutputStream()
        val crc = new java.util.zip.CRC32()
        val buf = new Array[Byte](64 << 10)
        while (!inf.finished()) {
          val n = try inf.inflate(buf) catch {
            case _: java.util.zip.DataFormatException => return out.toSeq
          }
          if (n > 0) {
            if (acc.size() + n > maxPlainBytes) return out.toSeq // bomb: cut
            acc.write(buf, 0, n)
            crc.update(buf, 0, n)
          } else if (!inf.finished()) return out.toSeq // truncated deflate
        }
        val trailer = ds + ((b.length - ds) - inf.getRemaining)
        val end = trailer + 8 // CRC32 + ISIZE, both LE
        if (end > b.length) return out.toSeq // trailer cut short
        def le32(q: Long): Long =
          (b(q.toInt) & 0xFFL) | ((b(q.toInt + 1) & 0xFFL) << 8) |
            ((b(q.toInt + 2) & 0xFFL) << 16) | ((b(q.toInt + 3) & 0xFFL) << 24)
        if (le32(trailer) != crc.getValue ||
            le32(trailer + 4) != (acc.size().toLong & 0xFFFFFFFFL))
          return out.toSeq // corrupt member (or a false boundary)
        out += ((p.toLong, (end - p).toLong, acc.toByteArray))
        p = end
      } finally inf.end()
    }
    out.toSeq
  }

  /** The persisted-index row shape — the CDX analogue: everything a
    * second pass needs to fetch one record without touching the rest
    * of the corpus. */
  private[pipeline] val WarcIndexSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("member_offset", LongType, nullable = false),
    StructField("member_length", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", LongType, nullable = true)))

  /** Per-record byte-range INDEX over a .warc.gz corpus — the CDX
    * analogue, built during the first (and only) full pass: one row per
    * record carrying its gzip member's exact (offset, length) in the
    * stored file plus the filterable header fields (type, uri,
    * content-length, status). Persist this narrow relation as the
    * index artifact; every later pass filters IT and fetches only the
    * surviving records' ranges ([[warcFetchRanged]]) instead of
    * re-decompressing the corpus.
    *
    * Subset stated plainly: one record per member, the layout
    * .warc.gz exists to provide (and Common Crawl ships) — a member
    * holding zero or several records is not independently fetchable
    * and ends the walk keeping the members before it (prefix
    * discipline, like every container walk). Unresolvable files ride
    * the shared tally. */
  def warcMemberIndex(df: DataFrame, contentCol: String, idCol: String,
                      unresolvedCounter: Option[
                        org.apache.spark.util.LongAccumulator] = None,
                      maxPlainBytes: Long = 1L << 30): DataFrame = {
    val outSchema = WarcIndexSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "warcMemberIndex")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          val members = gzipMembers(bytes, maxPlainBytes)
          var idx = 0L
          var ok = true
          members.foreach { case (off, len, plain) =>
            if (ok) {
              val recs = parseOne(id, plain, WarcRecordSchema)
              if (recs.size != 1) ok = false // not 1:1 — out of the subset
              else {
                val rec = recs.head
                out += new GenericRowWithSchema(Array[Any](
                  id, idx, off, len, rec.get(2), rec.get(3), rec.get(4),
                  rec.get(5)), outSchema)
                idx += 1
              }
            }
          }
          out.toSeq
        } catch {
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** [[warcMemberIndex]] over ON-DISK files via bounded WINDOWED reads —
    * the no-ceiling form of the index build, completing the crawl
    * container's scale story the way `mp4SampleTableRanged` did for
    * video: `readBinaryDir` makes one multi-GB ROW per file (and
    * hard-fails past ~2.1 GB); this walks each file through a sliding
    * window of `windowBytes`, runs the SAME verified member parser on
    * the window, indexes every member fully contained in it, and
    * advances to the last complete member's end — memory is O(window),
    * never O(file). A member that doesn't fit the window grows it
    * (doubling, capped at `maxWindowBytes`); a member past the cap —
    * or garbage — ends the file's walk keeping the indexed prefix
    * (gzipMembers cannot distinguish a cut member from garbage inside
    * a window, but EOF can: mid-file no-progress at the cap is
    * malformed-or-oversized either way, and both are out of the
    * subset). Offsets/record indexing identical to the in-memory
    * build — the two share oracles. */
  def warcMemberIndexRanged(files: DataFrame, pathCol: String, idCol: String,
                            unresolvedCounter: Option[
                              org.apache.spark.util.LongAccumulator] = None,
                            maxPlainBytes: Long = 1L << 30,
                            windowBytes: Int = 4 << 20,
                            maxWindowBytes: Int = 64 << 20): DataFrame = {
    require(windowBytes >= 1024, s"windowBytes too small: $windowBytes")
    require(maxWindowBytes >= windowBytes,
      s"maxWindowBytes ($maxWindowBytes) < windowBytes ($windowBytes)")
    val outSchema = WarcIndexSchema
    val spark = files.sparkSession
    val bconf = spark.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      val conf = bconf.value.value
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "warcMemberIndexRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        tally.walked(try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = path.getFileSystem(conf)
          val len = fs.getFileStatus(path).getLen
          val s = fs.open(path)
          try {
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            var p = 0L
            var idx = 0L
            var win = windowBytes
            var going = p < len
            while (going) {
              val want = math.min(win.toLong, len - p).toInt
              val buf = new Array[Byte](want)
              s.readFully(p, buf, 0, want)
              val members = gzipMembers(buf, maxPlainBytes)
              var advanced = 0L
              var ok = true
              members.foreach { case (off, mLen, plain) =>
                if (ok) {
                  val recs = parseOne(id, plain, WarcRecordSchema)
                  if (recs.size != 1) ok = false // not 1:1: out of subset
                  else {
                    val rec = recs.head
                    out += new GenericRowWithSchema(Array[Any](
                      id, idx, p + off, mLen, rec.get(2), rec.get(3),
                      rec.get(4), rec.get(5)), outSchema)
                    idx += 1
                    advanced = off + mLen
                  }
                }
              }
              if (!ok) going = false // malformed record: keep the prefix
              else if (advanced > 0) {
                p += advanced
                going = p < len
                win = windowBytes // a fresh window after progress
              } else if (p + want >= len) {
                going = false // trailing garbage / cut member at EOF
              } else if (win < maxWindowBytes) {
                win = math.min(win.toLong * 2, maxWindowBytes.toLong).toInt
              } else {
                going = false // member past the window cap: prefix stops
              }
            }
            out.toSeq
          } finally (try s.close()
          catch { case _: java.io.IOException => () })
        } catch {
          case _: java.io.IOException => Nil
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** [[warcMemberIndexRanged]] with INTRA-FILE parallelism — the
    * straggler fix: every 1:1 walk in this layer makes one task per
    * FILE, so one 500 GB .warc.gz serializes its whole index build on
    * a single core while 999 executors idle. This form explodes each
    * file into `shardBytes` spans (computed content-free from the
    * listing's length column), and each shard task independently
    * SYNCS to the first verified member boundary at or after its
    * start, then indexes every member STARTING inside its span (a
    * member may end beyond it — it belongs to the shard that contains
    * its start, so no member is emitted twice). Boundary verification
    * is decode-from-candidate: a 1f8b08 magic inside compressed
    * payload survives only by also inflating cleanly to a
    * CRC32+ISIZE-matched trailer AND yielding plain bytes that open
    * with "WARC/" — jointly ~2^-32 per candidate. record_idx is
    * assigned afterwards by a window over the NARROW index (per file,
    * by offset) — the one shuffle, tens of bytes per record.
    *
    * Semantic difference from the sequential builders, stated
    * plainly: damage inside a file does not end that file's index —
    * the walk RESYNCS at the next verified boundary (and later shards
    * sync independently), so the sharded builder indexes every
    * recoverable region. Tally scope, also stated plainly: damaged
    * records/regions found AFTER a sync count individually; an
    * unreadable file and shard-0 leading damage (garbage before the
    * first boundary — decidable only at offset 0, where a valid file
    * must carry one) count once per file; a MID-file shard's skipped
    * head is locally indistinguishable from a member straddling in
    * from the previous shard and is deliberately not counted. For a
    * 100 TB crawl with one corrupt chunk resync is what a
    * training-data pass wants; the sequential forms keep the strict
    * prefix discipline. On intact files all three builders agree
    * exactly. */
  def warcMemberIndexSharded(files: DataFrame, pathCol: String, idCol: String,
                             lenCol: String = "media_len",
                             unresolvedCounter: Option[
                               org.apache.spark.util.LongAccumulator] = None,
                             maxPlainBytes: Long = 1L << 30,
                             shardBytes: Long = 256L << 20,
                             windowBytes: Int = 4 << 20,
                             maxWindowBytes: Int = 64 << 20): DataFrame = {
    require(shardBytes >= windowBytes,
      s"shardBytes ($shardBytes) must be >= windowBytes ($windowBytes)")
    require(maxWindowBytes >= windowBytes,
      s"maxWindowBytes ($maxWindowBytes) < windowBytes ($windowBytes)")
    val outSchema = WarcIndexSchema
    val spark = files.sparkSession
    val bconf = spark.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
        col(pathCol).cast("string").as("p"),
        col(lenCol).cast("long").as("len"))
      // exact LONG arithmetic for the shard count: ceil over a double
      // quotient loses integer precision past ~2^53 and would silently
      // drop a huge file's tail shard. (len-1) div shardBytes is
      // ceil(len/shardBytes)-1 for len>=1 without the +shardBytes-1
      // overflow risk; len<=0 yields the single 0-shard via greatest.
      .withColumn("shard", explode(sequence(lit(0L),
        greatest(expr(s"(len - 1) div ${shardBytes}L"), lit(0L)))))
      // spread one file's shards across tasks — the whole point
      .repartition(col("p"), col("shard"))
    val raw = in.mapPartitions { it =>
      val conf = bconf.value.value
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "warcMemberIndexSharded")
      it.flatMap { r =>
        val id = r.getLong(0)
        val len = r.getLong(2)
        val shardStart = r.getLong(3) * shardBytes
        val shardEnd = math.min(shardStart + shardBytes, len)
        // an EMPTY file never enters the span loop (shardEnd == 0), so
        // tally it here — once, via its single 0-shard — exactly as the
        // sequential builders count it (tally.walked(Nil)); without
        // this the scaladoc's "count once per file" claim would hold
        // for every damage shape except the zero-length one
        if (len <= 0L) {
          if (shardStart == 0L) tally.walked(Nil) else Nil
        } else try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val s = path.getFileSystem(conf).open(path)
          try {
            def read(pos: Long, want: Int): Array[Byte] = {
              val b = new Array[Byte](want)
              s.readFully(pos, b, 0, want)
              b
            }
            /** Complete verified member at `c` opening a WARC record?
              * Window doubles until the member fits or the cap/EOF says
              * no. */
            def verifiedBoundary(c: Long): Boolean = {
              var win = windowBytes
              while (true) {
                val want = math.min(win.toLong, len - c).toInt
                if (want < 20) return false
                val ms = gzipMembers(read(c, want), maxPlainBytes)
                if (ms.nonEmpty) {
                  val plain = ms.head._3
                  return plain.length >= 5 && plain(0) == 'W' &&
                    plain(1) == 'A' && plain(2) == 'R' && plain(3) == 'C' &&
                    plain(4) == '/'
                }
                if (c + want >= len || win >= maxWindowBytes) return false
                win = math.min(win.toLong * 2, maxWindowBytes.toLong).toInt
              }
              false
            }
            /** First verified boundary in [q0, shardEnd), or −1. Scans
              * with a 2-byte window overlap so straddling magics are
              * seen. */
            def probeFrom(q0: Long): Long = {
              var q = q0
              while (q < shardEnd) {
                val want = math.min(windowBytes.toLong, len - q).toInt
                if (want < 3) return -1L
                val buf = read(q, want)
                var i = 0
                val lim = math.min(want.toLong, shardEnd - q).toInt
                while (i + 3 <= want && i < lim) {
                  if (buf(i) == 0x1F.toByte && (buf(i + 1) & 0xFF) == 0x8B &&
                      buf(i + 2) == 8 && verifiedBoundary(q + i))
                    return q + i
                  i += 1
                }
                q += math.max(want - 2, 1)
              }
              -1L
            }
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            var q = shardStart
            while (q < shardEnd) {
              val sync = probeFrom(q) // offset 0 verifies like any other
              // accounting at the shard's FIRST probe is only decidable
              // for shard 0: a valid file MUST have a boundary at byte 0,
              // so a shard-0 sync elsewhere (or nowhere) is leading
              // damage and counts once — mirroring the sequential
              // builders' whole-file tally on garbage. A mid-file
              // shard's skipped head is indistinguishable locally from
              // a member straddling in from the previous shard, so it
              // is deliberately NOT counted.
              if (shardStart == 0L && q == 0L && sync != 0L)
                tally.undecodable()
              if (sync < 0 || sync >= shardEnd) q = shardEnd
              else {
                // walk verified members from the boundary; stop at the
                // shard's start-limit, damage, or the window cap
                var p = sync
                var win = windowBytes
                var walking = true
                while (walking) {
                  val want = math.min(win.toLong, len - p).toInt
                  if (want <= 0 || p >= shardEnd) { walking = false; q = shardEnd }
                  else {
                    val members = gzipMembers(read(p, want), maxPlainBytes)
                    var advanced = 0L
                    var bad = false
                    members.foreach { case (off, mLen, plain) =>
                      if (!bad && p + off < shardEnd) {
                        val recs = parseOne(id, plain, WarcRecordSchema)
                        if (recs.size != 1) bad = true // ≠ 1:1: damaged
                        else {
                          val rec = recs.head
                          out += new GenericRowWithSchema(Array[Any](
                            id, -1L, p + off, mLen, rec.get(2), rec.get(3),
                            rec.get(4), rec.get(5)), outSchema)
                          advanced = off + mLen
                        }
                      }
                    }
                    if (bad) {
                      // skip the damaged record: count it, resync past it
                      tally.undecodable()
                      walking = false; q = p + advanced + 1
                    } else if (advanced > 0) {
                      p += advanced
                      win = windowBytes
                      if (p >= shardEnd) { walking = false; q = shardEnd }
                    } else if (p + want < len && win < maxWindowBytes) {
                      // no complete member yet — maybe it just overflows
                      // the window: grow and retry
                      win = math.min(win.toLong * 2, maxWindowBytes.toLong).toInt
                    } else {
                      // no member HERE (damaged / cut / over-cap bytes at
                      // p): count the region once and RESYNC — the prober
                      // scans forward for the next verified boundary, so
                      // members after the damage are still recovered
                      // (unlike the sequential builders' prefix stop)
                      tally.undecodable()
                      walking = false; q = p + 1
                    }
                  }
                }
              }
            }
            out.toSeq
          } finally (try s.close()
          catch { case _: java.io.IOException => () })
        } catch {
          // every shard of an unreadable file fails identically — count
          // the FILE once (via its 0-shard) so the tally keeps meaning
          // files, as in the sequential builders
          case _: java.io.IOException =>
            if (shardStart == 0L) tally.walked(Nil) else Nil
          case _: IndexOutOfBoundsException =>
            if (shardStart == 0L) tally.walked(Nil) else Nil
        }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
    // corpus-level record ordinals: one narrow shuffle per file
    raw.withColumn("record_idx",
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id")).orderBy(col("member_offset")))
        .cast("long") - 1L))
      .select(outSchema.fieldNames.map(col).toSeq: _*)
  }

  // ---- the PERSISTED CDX artifact (build / append / read) ----------------

  /** The stored index's meta row: epoch consistency pointers + counts +
    * the last applied streaming batch id. Readers union entries
    * [baseEpoch, epoch]; compaction re-bases. `lastBatchId` backs the
    * exactly-once streaming maintenance ([[ingestWarcIndexBatch]]);
    * -1 = never stream-fed, and batch-API appends leave it untouched. */
  private[graft] final case class WarcIndexMeta(
      epoch: Long, baseEpoch: Long, fileCount: Long, recordCount: Long,
      lastBatchId: Long = -1L)

  private[graft] def warcIndexEntriesDir(path: String, epoch: Long): String =
    s"$path/entries/e$epoch"

  /** The epoch's WALKED relation (one `media_id` per file handed to the
    * walk) — deliberately wider than the entries' id set: a file that
    * indexed ZERO records (empty, corrupt, unreadable) appears here but
    * not in entries, and the append delta-filter anti-joins THIS
    * relation, so such a file is walked once and never again. Keying
    * the filter on record-yielding ids instead would re-walk every
    * empty file on every daily append forever. */
  private[graft] def warcIndexWalkedDir(path: String, epoch: Long): String =
    s"$path/walked/e$epoch"

  private def readWarcIndexMeta(spark: org.apache.spark.sql.SparkSession,
                                path: String): WarcIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "warc index", "index")
    // meta written before the streaming-maintenance format carries no
    // last_batch_id — read it as "never stream-fed" instead of
    // breaking every pre-existing artifact on its first post-upgrade read
    val lastBatchId =
      if (r.schema.fieldNames.contains("last_batch_id"))
        r.getAs[Long]("last_batch_id")
      else -1L
    WarcIndexMeta(r.getAs[Long]("epoch"), r.getAs[Long]("base_epoch"),
      r.getAs[Long]("file_count"), r.getAs[Long]("record_count"),
      lastBatchId)
  }

  /** The stored snapshot's walked-file ids: meta's [base, epoch] union
    * over the walked relation — the append delta-filter's right side.
    * An epoch written before the walked-relation format has no walked
    * dir; its closest available walked set is the entries' distinct
    * ids (exactly the old anti-join key — correct for every file
    * except zero-record ones, which the old format could not remember
    * either), so pre-upgrade artifacts keep appending without a
    * rebuild, and every POST-upgrade epoch records walked ids exactly. */
  private def readWarcIndexWalked(spark: org.apache.spark.sql.SparkSession,
                                  path: String,
                                  meta: WarcIndexMeta): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    (meta.baseEpoch to meta.epoch).map { e =>
      val wd = new org.apache.hadoop.fs.Path(warcIndexWalkedDir(path, e))
      if (wd.getFileSystem(hconf).exists(wd))
        spark.read.parquet(wd.toString)
      else
        spark.read.parquet(warcIndexEntriesDir(path, e))
          .select(col("media_id")).distinct()
    }.reduce(_.unionByName(_))
  }

  /** Meta swap: write sideways, delete + rename LAST (the shared
    * artifact seam) — an interrupted build/append leaves the previous
    * consistent pointer, and the orphaned entries epoch is unreachable
    * until a successful retry re-points. */
  private def swapWarcIndexMeta(spark: org.apache.spark.sql.SparkSession,
                                path: String, meta: WarcIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "warc index",
      Seq((meta.epoch, meta.baseEpoch, meta.fileCount, meta.recordCount,
          meta.lastBatchId))
        .toDF("epoch", "base_epoch", "file_count", "record_count",
          "last_batch_id"))
  }

  /** Build the PERSISTED CDX artifact over a .warc.gz corpus — the
    * tenth artifact lifecycle: epoch-immutable entry relations plus a
    * meta consistency pointer, so daily crawl segments APPEND at
    * delta cost ([[appendWarcIndex]]) and every reader resolves one
    * consistent snapshot ([[readWarcIndex]]). Layout:
    *
    *   - `path/entries/e<N>` — the per-record byte-range rows indexed
    *     by epoch N's build/append (IMMUTABLE once written; built by
    *     the windowed no-ceiling walker from a content-free listing);
    *   - `path/walked/e<N>` — the media_ids WALKED by epoch N
    *     (record-yielding or not; see [[warcIndexWalkedDir]]) — the
    *     append delta-filter's key set;
    *   - `path/meta` — ONE row: `epoch`/`base_epoch` (readers union
    *     entries e<base>..e<epoch>), `file_count`, `record_count`,
    *     `last_batch_id` (streaming maintenance pointer).
    *
    * A reader resolves meta ONCE and unions only the pointed epochs —
    * a racing append's new epoch directory is invisible until its meta
    * swap lands, so reads are always a consistent snapshot. */
  def writeWarcIndex(files: DataFrame, pathCol: String, idCol: String,
                     path: String,
                     maxPlainBytes: Long = 1L << 30): Unit =
    commitWarcIndexEpoch(files.sparkSession, path, files, pathCol, idCol,
      next = 0L, baseEpoch = 0L, prevFiles = 0L, prevRecords = 0L,
      lastBatchId = -1L, maxPlainBytes = maxPlainBytes)

  /** Walk `fresh` (the caller has already delta-filtered) into epoch
    * `next`'s immutable entries + walked relations, then swap meta —
    * the shared tail of build, append, and streaming ingest. An
    * interrupted commit leaves the previous consistent pointer; the
    * orphaned epoch dirs are unreachable until a retry re-points. */
  private def commitWarcIndexEpoch(spark: org.apache.spark.sql.SparkSession,
                                   path: String, fresh: DataFrame,
                                   pathCol: String, idCol: String,
                                   next: Long, baseEpoch: Long,
                                   prevFiles: Long, prevRecords: Long,
                                   lastBatchId: Long,
                                   maxPlainBytes: Long): Unit = {
    warcMemberIndexRanged(fresh, pathCol, idCol,
        maxPlainBytes = maxPlainBytes)
      .write.mode("overwrite").parquet(warcIndexEntriesDir(path, next))
    fresh.select(col(idCol).cast("long").as("media_id")).distinct()
      .write.mode("overwrite").parquet(warcIndexWalkedDir(path, next))
    import org.apache.spark.sql.functions.countDistinct
    val added = spark.read.parquet(warcIndexEntriesDir(path, next))
      .agg(count(lit(1)), countDistinct(col("media_id"))).collect()(0)
    swapWarcIndexMeta(spark, path, WarcIndexMeta(next, baseEpoch,
      prevFiles + added.getLong(1), prevRecords + added.getLong(0),
      lastBatchId))
  }

  /** Append a new crawl segment's files to the stored index at DELTA
    * cost: only files whose media_id has never been WALKED are walked
    * (a re-dropped segment is an idempotent no-op — the anti-join runs
    * on the NARROW walked relation, never the corpus, and covers
    * zero-record files too), the new rows land in a fresh immutable
    * epoch directory, and meta swaps last. */
  def appendWarcIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      files: DataFrame, pathCol: String, idCol: String,
                      maxPlainBytes: Long = 1L << 30): Unit = {
    val meta = readWarcIndexMeta(spark, path)
    appendWarcIndexCore(spark, path, meta, files, pathCol, idCol,
      meta.lastBatchId, maxPlainBytes)
  }

  private def appendWarcIndexCore(spark: org.apache.spark.sql.SparkSession,
                                  path: String, meta: WarcIndexMeta,
                                  files: DataFrame, pathCol: String,
                                  idCol: String, lastBatchId: Long,
                                  maxPlainBytes: Long): Unit = {
    val fresh = files
      .withColumn("media_id", col(idCol).cast("long"))
      .join(readWarcIndexWalked(spark, path, meta),
        Seq("media_id"), "left_anti")
    commitWarcIndexEpoch(spark, path, fresh, pathCol, "media_id",
      meta.epoch + 1, meta.baseEpoch, meta.fileCount, meta.recordCount,
      lastBatchId, maxPlainBytes)
  }

  /** The stored index's STREAMING maintenance leg — call from a
    * `foreachBatch` over [[warcIngestStream]]'s file relation so the
    * landing-dir watcher continuously keeps the CDX artifact current.
    * Exactly-once across micro-batch replays: each applied batch id is
    * recorded behind the same last-swapped meta as the epoch pointer
    * (the quantile-ingest discipline, [[StatsOps.ingestQuantileBatch]]),
    * so a batch replayed after a crash is recognized and skipped
    * without listing or walking anything. The walked anti-join already
    * makes a replay a DATA no-op (every file was recorded walked when
    * the epoch committed) — the batch pointer additionally spares the
    * replay its empty epoch commit, so each batch advances the epoch
    * at most once. A commit that died before the meta swap left the old
    * pointer and an unreachable orphan epoch — the replayed batch
    * re-applies cleanly over it. First batch on an empty path builds
    * the artifact; a path whose meta is missing because a swap died
    * mid-commit is RECOVERED (`MetaIO.metaExistsOrRecover` completes
    * the interrupted rename), and a path carrying epoch dirs with no
    * recoverable meta is refused loudly — a naive rebuild would write
    * epoch 0 OVER the existing e0 and strand every later epoch.
    * Returns whether the batch was applied. Batch ids arrive
    * non-decreasing from ONE writer (Structured Streaming's contract):
    * the replay skip fires before the anti-join, so a batch id at or
    * one below the stored pointer is dropped quietly (the crash-replay
    * signature — the replayed batch is always the last one started).
    * An id REGRESSING further than that is not a replay: it is a reset
    * checkpoint (ids restart at 0) or a second maintainer on one index,
    * and silently dropping it would lose its files — so it REFUSES
    * loudly instead, naming the backfill ([[appendWarcIndex]], which
    * has no pointer and always anti-joins). */
  def ingestWarcIndexBatch(spark: org.apache.spark.sql.SparkSession,
                           path: String, files: DataFrame, pathCol: String,
                           idCol: String, batchId: Long,
                           maxPlainBytes: Long = 1L << 30): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "warc index", s"$path/entries")
      commitWarcIndexEpoch(spark, path, files, pathCol, idCol,
        next = 0L, baseEpoch = 0L, prevFiles = 0L, prevRecords = 0L,
        lastBatchId = batchId, maxPlainBytes = maxPlainBytes)
      true
    } else {
      val meta = readWarcIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("warc index", path, batchId,
          meta.lastBatchId, "files", "appendWarcIndex")
        false // replayed batch: no-op
      } else {
        appendWarcIndexCore(spark, path, meta, files, pathCol, idCol,
          batchId, maxPlainBytes)
        true
      }
    }
  }

  /** Compact when the live epoch window has grown to `maxEpochs` dirs
    * or more — the POLICY wrapper a continuous maintainer calls after
    * each append so a daily-append index self-bounds its directory
    * count (read cost is one parquet union per live epoch; unbounded
    * windows re-create the tiny-files problem compaction exists to
    * solve). Returns whether a compaction ran. Crash-safe by the same
    * argument as everything else here: compaction is itself an
    * epoch commit + meta swap, and a maintainer that dies between an
    * append and its compaction check simply re-checks after the next
    * batch. */
  def maybeCompactWarcIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readWarcIndexMeta(spark, path)
    if (meta.epoch - meta.baseEpoch + 1 >= maxEpochs) {
      compactWarcIndex(spark, path)
      true
    } else false
  }

  /** One consistent snapshot of the stored index: meta resolves once,
    * the pointed epochs union — feed (a filtered view of) this to
    * [[warcFetchRanged]] exactly like a freshly built index. */
  def readWarcIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val meta = readWarcIndexMeta(spark, path)
    spark.read.parquet(
      (meta.baseEpoch to meta.epoch).map(warcIndexEntriesDir(path, _)): _*)
  }

  /** Compact the stored index: rewrite the current snapshot's union
    * (entries AND walked) as ONE fresh epoch and re-base the meta
    * pointers onto it — the lifecycle step that keeps a daily-append
    * index from accumulating hundreds of small epoch directories
    * (listing overhead + tiny files at every read).
    *
    * JANITOR discipline — the {current, superseded} GC the other nine
    * lifecycles get from `MetaIO.pruneEpochs`, adapted to this
    * artifact's RANGE pointer: after the swap the live window is
    * {next} and the generation this compaction superseded is
    * [old base, old epoch] — a racing reader that resolved meta just
    * before the swap still probes exactly those dirs, so they get one
    * commit's grace. Everything BELOW the old base was superseded by
    * an EARLIER compaction (two swaps ago at least — no reader can
    * hold a pointer into it) and is deleted here, under both relation
    * roots. Appends never prune: their window [base, epoch] only
    * grows, so they strand nothing. Without this, every compaction
    * leaked one full corpus-index copy forever. Counts are unchanged;
    * the snapshot is byte-identical to the pre-compaction read. */
  def compactWarcIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): Unit = {
    val meta = readWarcIndexMeta(spark, path)
    val next = meta.epoch + 1
    readWarcIndex(spark, path)
      .write.mode("overwrite").parquet(warcIndexEntriesDir(path, next))
    readWarcIndexWalked(spark, path, meta).distinct()
      .write.mode("overwrite").parquet(warcIndexWalkedDir(path, next))
    swapWarcIndexMeta(spark, path,
      WarcIndexMeta(next, next, meta.fileCount, meta.recordCount,
        meta.lastBatchId))
    MetaIO.pruneEpochs(spark, Seq(s"$path/entries", s"$path/walked"),
      superseded = meta.baseEpoch)
  }

  /** Per-record byte-range index over PLAIN (uncompressed) .warc files
    * — the CDX analogue without the compression layer: record extents
    * come straight from the parser (start to payload end, the minimal
    * slice that re-parses as exactly that record), so the index falls
    * out of the SAME forward walk that extracts the records. Row shape
    * is identical to [[warcMemberIndex]] (member_offset/member_length
    * name the record's extent here), so the same survivor filters feed
    * [[warcFetchRangedPlain]]. Prefix discipline and tallying as in
    * [[warcRecords]]. */
  def warcRecordIndexPlain(df: DataFrame, contentCol: String, idCol: String,
                           unresolvedCounter: Option[
                             org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = WarcIndexSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "warcRecordIndexPlain")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          val extents =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val recs = parseOne(id, bytes, WarcRecordSchema, extents)
          recs.iterator.zip(extents.iterator).zipWithIndex.map {
            case ((rec, (off, len)), i) =>
              new GenericRowWithSchema(Array[Any](
                id, i.toLong, off, len, rec.get(2), rec.get(3), rec.get(4),
                rec.get(5)), outSchema): Row
          }.toSeq
        } catch {
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** Fetch ONLY the surviving records of an indexed .warc.gz corpus by
    * byte range — the second-pass primitive: `index` is (a filtered
    * view of) [[warcMemberIndex]]'s output, `files` maps media_id to
    * the stored file's path, and each surviving record costs exactly
    * ONE positioned read of `member_length` bytes (a ranged GET on
    * S3A/HDFS) + one member's decompression — bytes moved are
    * proportional to SURVIVORS, not corpus.
    *
    * Scale shape: the narrow index joins to paths and repartitions BY
    * FILE, ranges sorted within each partition, so one input stream
    * serves a file's fetches in offset order (sequential-friendly on
    * object stores) — and CONSECUTIVE ranges COALESCE into one
    * positioned read: touching/overlapping members always share a
    * read, and `coalesceGap` > 0 additionally merges ranges separated
    * by at most that many unwanted bytes (on object stores a GET has
    * fixed latency ~ tens of ms, so paying a small gap of discarded
    * bytes to halve the request count is the standard trade — set it
    * to ~1 MB on S3A; merged reads are capped at `maxBatchBytes`).
    * Output rows are full [[warcRecords]] rows with the INDEX's
    * record_idx. Error discipline is per-RECORD (fetches are
    * independent — there is no prefix): a missing file, short read,
    * or malformed member counts that record in the tally and skips
    * it — a failed COALESCED read counts each of its records; walker
    * bugs still fail the query. */
  def warcFetchRanged(files: DataFrame, pathCol: String, idCol: String,
                      index: DataFrame,
                      unresolvedCounter: Option[
                        org.apache.spark.util.LongAccumulator] = None,
                      maxPlainBytes: Long = 1L << 30,
                      coalesceGap: Long = 0L,
                      maxBatchBytes: Long = 64L << 20): DataFrame =
    fetchRangedCore(files, pathCol, idCol, index, unresolvedCounter,
      coalesceGap, maxBatchBytes, "warcFetchRanged") { (id, len, member) =>
      // the slice must be exactly one CRC-verified gzip member whose
      // plain bytes hold exactly one record
      gzipMembers(member, maxPlainBytes) match {
        case Seq((0L, l, plain)) if l == len =>
          parseOne(id, plain, WarcRecordSchema)
        case _ => Nil // member ≠ its exact indexed extent
      }
    }

  /** [[warcFetchRanged]] for PLAIN (uncompressed) .warc corpora: the
    * index comes from [[warcRecordIndexPlain]] (record extents straight
    * from the parser — no compression layer), and each fetched slice
    * re-parses directly. Same coalescing, range partitioning, and
    * per-record error discipline. */
  def warcFetchRangedPlain(files: DataFrame, pathCol: String, idCol: String,
                           index: DataFrame,
                           unresolvedCounter: Option[
                             org.apache.spark.util.LongAccumulator] = None,
                           coalesceGap: Long = 0L,
                           maxBatchBytes: Long = 64L << 20): DataFrame =
    fetchRangedCore(files, pathCol, idCol, index, unresolvedCounter,
      coalesceGap, maxBatchBytes, "warcFetchRangedPlain") { (id, _, slice) =>
      parseOne(id, slice, WarcRecordSchema)
    }

  /** The shared fetch engine behind both storage layouts: batching,
    * coalescing, range partitioning, stream reuse, and per-record
    * accounting live HERE once; `decodeMember(id, indexedLen, slice)`
    * turns one fetched byte slice into its record rows (anything but
    * exactly one row is counted as data). */
  private def fetchRangedCore(files: DataFrame, pathCol: String,
                              idCol: String, index: DataFrame,
                              unresolvedCounter: Option[
                                org.apache.spark.util.LongAccumulator],
                              coalesceGap: Long, maxBatchBytes: Long,
                              label: String)(
      decodeMember: (Long, Long, Array[Byte]) => Seq[Row]): DataFrame = {
    require(coalesceGap >= 0, s"coalesceGap must be >= 0: $coalesceGap")
    require(maxBatchBytes >= 1, s"maxBatchBytes must be >= 1: $maxBatchBytes")
    val outSchema = WarcRecordSchema
    val spark = files.sparkSession
    val bconf = spark.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val idx = index.select(col("media_id").cast("long").as("media_id"),
      col("record_idx").cast("long").as("record_idx"),
      col("member_offset").cast("long").as("member_offset"),
      col("member_length").cast("long").as("member_length"))
    // RANGE partitioning, not hash-by-file: a hash would pin all of one
    // file's survivors on one task (the giant-file straggler), while
    // range partitioning on (file, offset) still keeps each partition a
    // CONTIGUOUS offset slice — so stream reuse and range coalescing
    // work unchanged, and a file dominating the survivor set spreads
    // across tasks. The narrow joined relation is SEVERED first:
    // RangePartitioner's bounds-sampling job would otherwise re-execute
    // the index-producing plan upstream (a live warcMemberIndex build
    // would run — and fire its tally — twice)
    val work = Checkpoints.sever(
        files.select(col(idCol).cast("long").as("media_id"),
            col(pathCol).cast("string").as("p"))
          .join(idx, "media_id"))
      .repartitionByRange(col("p"), col("member_offset"))
      .sortWithinPartitions(col("p"), col("member_offset"))
    work.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        label)
      val streams = new graft.sources.ReusedFsStream(bconf.value.value)
      def validLen(l: Long): Boolean = l >= 0 && l <= Int.MaxValue - 16
      // assemble maximal coalesced batches from the (path, offset)-sorted
      // rows: same file, next range starting within coalesceGap of the
      // batch's current end, merged span under maxBatchBytes; a row with
      // an invalid length never merges (it forms its own batch and is
      // counted alone)
      val rows = it.buffered
      val batches = new scala.collection.AbstractIterator[Seq[Row]] {
        def hasNext: Boolean = rows.hasNext
        def next(): Seq[Row] = {
          val first = rows.next()
          val path = first.getString(1)
          val fl = first.getLong(4)
          if (!validLen(fl) || first.getLong(3) < 0) return Seq(first)
          val start = first.getLong(3)
          var end = start + fl
          val acc = scala.collection.mutable.ArrayBuffer(first)
          var more = true
          while (more && rows.hasNext) {
            val n = rows.head
            val no = n.getLong(3); val nl = n.getLong(4)
            if (n.getString(1) == path && validLen(nl) && no >= start &&
                no <= end + coalesceGap &&
                math.max(end, no + nl) - start <= maxBatchBytes) {
              acc += rows.next()
              end = math.max(end, no + nl)
            } else more = false
          }
          acc.toSeq
        }
      }
      batches.flatMap { batch =>
        val path = batch.head.getString(1)
        val start = batch.head.getLong(3)
        // ONE positioned read serves the whole batch; a failure counts
        // every record in it (each record yields Nil below)
        val bufOpt = try {
          if (batch.exists(r => !validLen(r.getLong(4)) || r.getLong(3) < 0))
            throw new java.io.IOException("member range out of bounds")
          val end = batch.iterator
            .map(r => r.getLong(3) + r.getLong(4)).max
          if (end - start > Int.MaxValue - 16)
            throw new java.io.IOException(s"batch span out of range")
          val b = new Array[Byte]((end - start).toInt)
          streams.forPath(path).readFully(start, b, 0, b.length)
          Some(b)
        } catch {
          case _: java.io.IOException => None // missing file / short read
        }
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val recordIdx = r.getLong(2)
          val off = r.getLong(3)
          val len = r.getLong(4)
          tally.walked(bufOpt match {
            case None => Nil
            case Some(b) =>
              try {
                val member = java.util.Arrays.copyOfRange(
                  b, (off - start).toInt, (off - start + len).toInt)
                decodeMember(id, len, member) match {
                  case Seq(rec) => // re-stamp the corpus record_idx
                    val vals =
                      Array.tabulate[Any](outSchema.size)(rec.get)
                    vals(1) = recordIdx
                    Seq(new GenericRowWithSchema(vals, outSchema): Row)
                  case _ => Nil // ≠ 1 record in the slice: data, counted
                }
              } catch {
                case _: IndexOutOfBoundsException => Nil
              }
          })
        }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  private val WarcRecordSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", LongType, nullable = true),
    StructField("body", StringType, nullable = true)))

  /** Parse WARC bytes into one row per record: (media_id, record_idx,
    * warc_type, target_uri, content_length, http_status, body) — the
    * HTTP status and body only for records whose payload is an HTTP
    * message (others carry the raw payload as `body` with null
    * status). One forward walk per file; a malformed or cut-short
    * record ends the walk keeping the fully-delimited records before
    * it. */
  def warcRecords(df: DataFrame, contentCol: String, idCol: String,
                  unresolvedCounter: Option[
                    org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = WarcRecordSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter, "warcRecords")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try parseOne(id, bytes, outSchema)
        catch {
          // malformed offset arithmetic is data; walker bugs propagate
          // (parseOne itself never throws NumberFormatException — all
          // numeric fields parse via toLongOption / digit guards)
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** One forward record walk; `extents` (when supplied) collects each
    * record's byte extent [start, payload end) — the minimal slice that
    * re-parses as exactly that one record (the trailing separator is
    * optional to the parser, so it is excluded): the PLAIN-warc
    * analogue of a gzip member's (offset, length). */
  private def parseOne(id: Long, bytes: Array[Byte],
                       outSchema: StructType,
                       extents: scala.collection.mutable.ArrayBuffer[
                         (Long, Long)] = null): Seq[Row] = {
    val s = new String(bytes, "ISO-8859-1") // byte-preserving: 1 char = 1 byte
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var p = 0
    var idx = 0L
    while (p < s.length) {
      if (!s.startsWith("WARC/", p)) return out.toSeq
      val hdrEnd = s.indexOf("\r\n\r\n", p)
      if (hdrEnd < 0) return out.toSeq
      val headers = s.substring(p, hdrEnd).split("\r\n").drop(1)
        .flatMap { line =>
          val c = line.indexOf(':')
          if (c < 0) None else Some(line.substring(0, c).trim.toLowerCase ->
            line.substring(c + 1).trim)
        }.toMap
      // missing AND non-numeric Content-Length both end the walk KEEPING
      // the fully-delimited records before this one (the same prefix
      // discipline as a cut-short payload) — a throw here would discard
      // the whole file's already-parsed prefix for one bad record
      val len = headers.get("content-length").flatMap(_.toLongOption) match {
        case Some(v) => v
        case None => return out.toSeq
      }
      val payStart = hdrEnd + 4
      if (len < 0 || len > s.length - payStart) return out.toSeq // truncated
      val payload = s.substring(payStart, payStart + len.toInt)
      val (status, body) =
        if (payload.startsWith("HTTP/")) {
          val sl = payload.indexOf("\r\n")
          val st = if (sl > 0) {
            val parts = payload.substring(0, sl).split(" ")
            // bounded ASCII-digit check: an odd status token (empty from
            // doubled spaces, Unicode digits, overlong runs) must yield
            // a null status for THIS record, never a NumberFormat throw
            // that drops the whole file
            if (parts.length >= 2 && parts(1).nonEmpty &&
                parts(1).length <= 9 &&
                parts(1).forall(c => c >= '0' && c <= '9'))
              java.lang.Long.valueOf(parts(1).toLong)
            else null
          } else null
          val be = payload.indexOf("\r\n\r\n")
          (st, if (be >= 0) payload.substring(be + 4) else "")
        } else (null, payload)
      out += new GenericRowWithSchema(Array[Any](
        id, idx, headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", null),
        len, status, body), outSchema)
      if (extents != null)
        extents += ((p.toLong, (payStart + len.toInt - p).toLong))
      idx += 1
      // the two CRLFs separating records; a file ending exactly at the
      // payload keeps the record (trailing separator optional)
      p = payStart + len.toInt
      if (s.startsWith("\r\n\r\n", p)) p += 4
      else if (p < s.length) return out.toSeq // garbage between records
    }
    out.toSeq
  }

  /** URL canonicalization, columnar and engine-exact — the step before
    * any URL-keyed dedup/join on a crawl (the same page arrives as
    * `HTTP://Example.COM:80/x#frag` and `http://example.com/x`):
    * lowercase the scheme and host, drop the scheme's default port
    * (:80 for http, :443 for https), drop the fragment; path and query
    * pass through byte-exact (case is significant there). Strings
    * without a scheme://host shape pass through unchanged. Anchored
    * simple patterns with identical Java-regex/RE2 semantics. */
  def urlCanonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authority = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo is CASE-SENSITIVE (RFC 3986) — only the host lowers;
    // split on the LAST '@' of the authority
    val userinfo = regexp_extract(authority, "^(.*@)", 1)
    val hostport = lower(regexp_extract(authority, "([^@]*)$", 1))
    val rest = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), userinfo, host, rest))
  }

  /** HTML → text, columnar and engine-exact: strip tags, decode the
    * five basic entities, collapse runs of ASCII whitespace, trim.
    * Deliberately simple patterns with identical semantics in Java
    * regex (Spark) and RE2 (DuckDB) — the seam a production system
    * swaps its own extractor into, like the PII pattern pack. */
  def htmlText(html: Column): Column = {
    val stripped = regexp_replace(html, "<[^>]*>", " ")
    // &amp; decodes LAST: "&amp;lt;" must yield the literal "&lt;",
    // not "<" (the double-decode bug); both engines run this exact
    // sequence, so the oracle matches by construction
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(stripped,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }
}
