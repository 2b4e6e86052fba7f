package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Matroska/WebM (EBML) container walk — the sixth container grammar
  * CLASS in the media layer, and a genuinely different one: where
  * ISO-BMFF uses fixed 32/64-bit box sizes, RIFF fixed LE chunk sizes,
  * MP3 self-describing frame headers, and WARC text headers, EBML
  * length-prefixes EVERYTHING with leading-zero-coded VARINTS (the
  * first byte's leading zeros give the field width, 1..8 bytes). The
  * walk resolves the video track's SimpleBlocks into one row per
  * block: (media_id, block_idx, offset, size, ts_ms, is_key,
  * track_num) — offset/size address the raw frame payload, ts_ms is
  * cluster timestamp + the block's signed relative timestamp, is_key
  * is the SimpleBlock keyframe flag.
  *
  * Subset stated plainly: one Segment, the FIRST video TrackEntry
  * (TrackType 1) of the FIRST Tracks element, Clusters walked in file
  * order — clusters preceding Tracks are SKIPPED (both walks; the
  * ranged one streams and cannot look ahead, and the in-memory one
  * deliberately matches rather than being more lenient), SimpleBlocks
  * only (BlockGroup lacing is out — a block the subset cannot address
  * is skipped by its declared size, never guessed at). Honest truncation:
  * a malformed or cut-short element ends the walk keeping all prior
  * blocks; unresolvable files ride the shared tally; walker bugs fail
  * the query. Same 1:1 partition-parallel mapPartitions shape as every
  * other walk. */
object MkvOps {

  /** Deterministic synthetic-MKV formulas, mirrored by the oracle. */
  def synthMkvClusters(id: Long): Int = (2 + id % 2).toInt
  def synthMkvClusterBlocks(id: Long, c: Int): Int = (2 + (id + c) % 2).toInt
  def synthMkvBlockSize(id: Long, i: Int): Int =
    (30 + (id * 7 + i * 5) % 40).toInt

  private[pipeline] val MkvBlockSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("block_idx", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("is_key", BooleanType, nullable = false),
    StructField("track_num", LongType, nullable = false)))

  /** id → REAL EBML bytes: EBML header (DocType), Segment holding
    * Info(TimestampScale), Tracks(one video TrackEntry), and
    * `synthMkvClusters(id)` Clusters of SimpleBlocks. The ENCODER uses
    * fixed 2-byte size varints so the oracle can rebuild every offset
    * arithmetically; the PARSER reads general varints — the encoder's
    * choice is a layout convenience, not a grammar restriction. */
  def encodeSyntheticMkv(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        var i = 0
        val clusters = (0 until synthMkvClusters(id)).map { c =>
          IndexedSeq.fill(synthMkvClusterBlocks(id, c)) {
            val sz = synthMkvBlockSize(id, i)
            val a = Array.tabulate[Byte](sz)(j =>
              ((id + i * 7 + j) % 251).toByte)
            i += 1
            a
          }
        }
        new GenericRowWithSchema(Array[Any](id, buildMkv(clusters)),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** The MKV twin of the other containers' video encoders: the SAME
    * logical clip (synthFrameCount/synthFrameImageId formulas, real
    * JDK PNG frames) split across two clusters, so the block walk +
    * shared decode reproduce the one frame-formula oracle — the SIXTH
    * container variant over one clip. */
  def encodeSyntheticMkvVideo(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val k = MultimodalOps.synthFrameCount(id)
        val frames = IndexedSeq.tabulate(k) { j =>
          val fid = MultimodalOps.synthFrameImageId(id, j)
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
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val c1 = (k + 1) / 2
        new GenericRowWithSchema(Array[Any](id,
          buildMkv(Seq(frames.take(c1), frames.drop(c1)))), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** One file from explicit per-cluster frame payloads. All size
    * varints are 2-byte (0x4000 | n) — a layout convenience for the
    * oracle arithmetic; the parser reads general varints. `trackNum`
    * (1..127, encoded as the 1-byte varint 0x80|n) exists so specs can
    * craft the 0xFF-track-127 shape — the one value where a naive
    * size-context varint read would misparse a legal block. */
  private[pipeline] def buildMkv(clusters: Seq[IndexedSeq[Array[Byte]]],
                                 trackNum: Int = 1): Array[Byte] = {
    require(trackNum >= 1 && trackNum <= 127, s"trackNum 1..127: $trackNum")
    val bos = new java.io.ByteArrayOutputStream()
    def raw(bs: Int*): Unit = bs.foreach(b => bos.write(b & 0xFF))
    def size2(n: Int): Unit = { require(n <= 0x3FFF); raw(0x40 | (n >> 8), n & 0xFF) }
    // EBML header: ID + size + DocType("matroska")
    raw(0x1A, 0x45, 0xDF, 0xA3); size2(12)
    raw(0x42, 0x82); size2(8); bos.write("matroska".getBytes("US-ASCII"))
    // body elements assembled first so Segment's size is exact
    val body = new java.io.ByteArrayOutputStream()
    def braw(bs: Int*): Unit = bs.foreach(b => body.write(b & 0xFF))
    def bsize2(n: Int): Unit = { require(n <= 0x3FFF); braw(0x40 | (n >> 8), n & 0xFF) }
    // Info: TimestampScale = 1_000_000 ns (ms ticks)
    braw(0x15, 0x49, 0xA9, 0x66); bsize2(8)
    braw(0x2A, 0xD7, 0xB1); bsize2(3); braw(0x0F, 0x42, 0x40)
    // Tracks: one video TrackEntry (number 1, type 1, CodecID V_GRAFT)
    braw(0x16, 0x54, 0xAE, 0x6B); bsize2(21)
    braw(0xAE); bsize2(18)
    braw(0xD7); bsize2(1); braw(trackNum)     // TrackNumber
    braw(0x83); bsize2(1); braw(1)            // TrackType: video
    braw(0x86); bsize2(7); body.write("V_GRAFT".getBytes("US-ASCII"))
    // Clusters
    clusters.zipWithIndex.foreach { case (frames, c) =>
      val blocks = frames.zipWithIndex.map { case (fr, j) =>
        // SimpleBlock payload: track varint (0x81) + s16 rel ts + flags
        val pb = new java.io.ByteArrayOutputStream()
        pb.write(0x80 | trackNum)
        val rel = j * 40
        pb.write((rel >> 8) & 0xFF); pb.write(rel & 0xFF)
        pb.write(if (j == 0) 0x80 else 0x00) // keyframe flag
        pb.write(fr)
        pb.toByteArray
      }
      val ts = c * 1000
      val payloadLen = 5 + blocks.map(b => 3 + b.length).sum
      braw(0x1F, 0x43, 0xB6, 0x75); bsize2(payloadLen)
      braw(0xE7); bsize2(2); braw((ts >> 8) & 0xFF, ts & 0xFF)
      blocks.foreach { b => braw(0xA3); bsize2(b.length); body.write(b) }
    }
    raw(0x18, 0x53, 0x80, 0x67); size2(body.size())
    body.writeTo(bos)
    bos.toByteArray
  }

  /** Resolve the video track's SimpleBlocks — see the object scaladoc. */
  def mkvBlockTable(df: DataFrame, contentCol: String, idCol: String,
                    unresolvedCounter: Option[
                      org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = MkvBlockSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "mkvBlockTable")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try walkOne(id, bytes, outSchema)
        catch { case _: IndexOutOfBoundsException => Nil })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** General EBML varint at `p`: (value, width) with the marker bit
    * STRIPPED, or null on malformed/oversized input. Width 1..8.
    *
    * The all-ones data pattern is CONTEXT-DEPENDENT in RFC 8794: in an
    * element-SIZE field it means UNKNOWN size — returned as value −1 so
    * callers must handle it explicitly (the Segment clamps to the file,
    * everything else refuses) — but in a SimpleBlock's track-number
    * field it is just the minimal encoding of track 127 (0xFF), a legal
    * value. `sizeContext = false` returns the literal value, so block
    * parsing never mistakes track 127 for a size sentinel. */
  private def varint(b: Array[Byte], p: Int,
                     sizeContext: Boolean = true): (Long, Int) = {
    if (p >= b.length) return null
    val first = b(p) & 0xFF
    if (first == 0) return null // width > 8: out of EBML
    val width = Integer.numberOfLeadingZeros(first) - 23 // 32-bit NLZ − 24 + 1
    if (p + width > b.length) return null
    var v = (first & (0xFF >>> width)).toLong
    var k = 1
    while (k < width) { v = (v << 8) | (b(p + k) & 0xFFL); k += 1 }
    if (sizeContext && v == (1L << (7 * width)) - 1) (-1L, width)
    else (v, width)
  }

  /** An EBML unsigned integer payload (1..8 bytes big-endian). */
  private def ebmlUint(b: Array[Byte], s: Long, e: Long): Option[Long] = {
    val n = e - s
    if (n < 1 || n > 8) return None
    var v = 0L
    var p = s
    while (p < e) { v = (v << 8) | (b(p.toInt) & 0xFFL); p += 1 }
    Some(v)
  }

  /** Raw element ID at `p` (marker bit KEPT, the Matroska convention):
    * (id, width) or null. */
  private def elementId(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) return null
    val first = b(p) & 0xFF
    if (first == 0) return null
    val width = Integer.numberOfLeadingZeros(first) - 23
    if (width > 4 || p + width > b.length) return null // EBML IDs are 1..4 bytes
    var v = 0L
    var k = 0
    while (k < width) { v = (v << 8) | (b(p + k) & 0xFFL); k += 1 }
    (v, width)
  }

  /** children of [from, to): (elementId, payStart, payEnd), stopping
    * at the first malformed element (prefix discipline). */
  private def ebmlChildren(b: Array[Byte], from: Long,
                           to: Long): Seq[(Long, Long, Long)] = {
    val kids = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var p = from
    var ok = true
    while (ok && p < to) {
      val idv = elementId(b, p.toInt)
      if (idv == null) ok = false
      else {
        val sz = varint(b, p.toInt + idv._2)
        if (sz == null || sz._1 < 0) ok = false // unknown size: not nestable
        else {
          val payS = p + idv._2 + sz._2
          val payE = payS + sz._1
          if (payE < payS || payE > to) ok = false
          else { kids += ((idv._1, payS, payE)); p = payE }
        }
      }
    }
    kids.toSeq
  }

  /** The Segment's clamped payload extent: ONE loop serving both the
    * intact case and the two degraded cases — a declared extent
    * overrunning the buffer (truncated download) and RFC 8794's
    * UNKNOWN size (all data bits set; how live-streamed MKVs ship) —
    * both clamp to the buffer end, so the walk keeps every fully
    * contained cluster. Leading siblings must still be well-formed. */
  private def findSegment(b: Array[Byte]): Option[(Long, Long)] = {
    var p = 0L
    while (p < b.length) {
      val idv = elementId(b, p.toInt)
      if (idv == null) return None
      val szv = varint(b, p.toInt + idv._2)
      if (szv == null) return None
      val payS = p + idv._2 + szv._2
      if (idv._1 == 0x18538067L)
        return Some((payS,
          if (szv._1 < 0) b.length.toLong
          else math.min(payS + szv._1, b.length.toLong)))
      if (szv._1 < 0 || payS + szv._1 > b.length) return None
      p = payS + szv._1
    }
    None
  }

  /** The FIRST video TrackEntry's number inside a Tracks payload —
    * TrackNumber and TrackType read as FULL EBML uints (a legal
    * TrackNumber like 300 is two bytes; reading just the first byte
    * would disagree with the block-side varint parser). */
  private def videoTrackNum(b: Array[Byte], ts: Long, te: Long): Option[Long] =
    (for {
      (0xAEL, es, ee) <- ebmlChildren(b, ts, te)
      entry = ebmlChildren(b, es, ee)
      tpe <- entry.collectFirst { case (0x83L, s0, e0) => ebmlUint(b, s0, e0) }
        .flatten
      if tpe == 1L
      num <- entry.collectFirst { case (0xD7L, s0, e0) => ebmlUint(b, s0, e0) }
        .flatten
    } yield num).headOption

  private[pipeline] def walkOne(id: Long, b: Array[Byte],
                      outSchema: StructType): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    def children(from: Long, to: Long): Seq[(Long, Long, Long)] =
      ebmlChildren(b, from, to)
    val seg = findSegment(b).getOrElse(return Nil)
    val segKids = children(seg._1, seg._2)
    // Segment children IN FILE ORDER, exactly like the ranged walk (it
    // streams and cannot look ahead): the FIRST Tracks element resolves
    // the video track number, clusters BEFORE it are skipped, clusters
    // after it are walked — any lookahead here would make the in-memory
    // walk more lenient than its ranged twin on non-canonical files
    var trackNum = -1L
    var blockIdx = 0L
    segKids.foreach {
      case (0x1654AE6BL, ts, te) if trackNum < 0 =>
        trackNum = videoTrackNum(b, ts, te).getOrElse(return out.toSeq)
        if (trackNum <= 0) return out.toSeq // track 0 is not addressable
      case (0x1F43B675L, cs, ce) if trackNum > 0 =>
        val kids = children(cs, ce)
        // the Timestamp must exist, PRECEDE the first block (the
        // universal layout — the ranged walk streams and cannot look
        // ahead, so the in-memory walk must not be more lenient), and
        // fit an EBML uint (an oversized payload is malformed, not
        // silently-overflowing)
        val tsPos = kids.indexWhere(_._1 == 0xE7L)
        val blkPos = kids.indexWhere(_._1 == 0xA3L)
        if (tsPos < 0 || (blkPos >= 0 && blkPos < tsPos)) return out.toSeq
        val clusterTs = ebmlUint(b, kids(tsPos)._2, kids(tsPos)._3)
          .getOrElse(return out.toSeq)
        kids.foreach {
          case (0xA3L, bs, be) =>
            val tn = varint(b, bs.toInt, sizeContext = false)
            if (tn == null) return out.toSeq
            val hdr = bs + tn._2
            if (hdr + 3 > be) return out.toSeq
            if (tn._1 == trackNum) {
              val rel = ((b(hdr.toInt) & 0xFF) << 8 |
                (b(hdr.toInt + 1) & 0xFF)).toShort.toLong
              val flags = b(hdr.toInt + 2) & 0xFF
              val dataS = hdr + 3
              out += new GenericRowWithSchema(Array[Any](
                id, blockIdx, dataS, be - dataS, clusterTs + rel,
                (flags & 0x80) != 0, trackNum), outSchema)
              blockIdx += 1
            }
          case _ => ()
        }
      case _ => ()
    }
    out.toSeq
  }

  /** [[mkvBlockTable]] over ON-DISK files via ranged reads — every
    * container's no-ceiling form, EBML edition: element headers are
    * hopped by positioned reads of at most 12 bytes (4-byte max ID +
    * 8-byte max size varint), the tiny Tracks payload is fetched whole
    * to find the video track, and inside each Cluster only the
    * per-block HEADERS (track varint + relative timestamp + flags, ≤ a
    * dozen bytes) are fetched — frame payloads are never read. Like
    * RIFF, EBML interleaves metadata with payload, so the hop count is
    * O(elements); the fetched bytes stay O(blocks · 16). Tracks must
    * precede Clusters (the universal layout; clusters before Tracks
    * are skipped). Segment extent clamps to the file length like the
    * in-memory walk. */
  def mkvBlockTableRanged(files: DataFrame, pathCol: String, idCol: String,
                          unresolvedCounter: Option[
                            org.apache.spark.util.LongAccumulator] = None,
                          maxTracksBytes: Long = 1L << 20): DataFrame = {
    val outSchema = MkvBlockSchema
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      val conf = bconf.value.value
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "mkvBlockTableRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        tally.walked(try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = path.getFileSystem(conf)
          val len = fs.getFileStatus(path).getLen
          val s = fs.open(path)
          try mkvRangedWalk(s, len, id, maxTracksBytes, outSchema)
          finally (try s.close() catch { case _: java.io.IOException => () })
        } catch {
          case _: java.io.IOException => Nil
          case _: IndexOutOfBoundsException => Nil
          case _: IllegalArgumentException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  private[pipeline] def mkvRangedWalk(s: org.apache.hadoop.fs.FSDataInputStream,
                            fileLen: Long, id: Long, maxTracksBytes: Long,
                            outSchema: StructType): Seq[Row] = {
    val hdr = new Array[Byte](12)
    /** Element header at `p` by positioned read:
      * (elementId, payStart, sizeValue) — sizeValue −1 is RFC 8794's
      * UNKNOWN size (only the Segment may carry it; see below) — or
      * null on malformed input. */
    def header(p: Long): (Long, Long, Long) = {
      if (p + 2 > fileLen) return null
      val want = math.min(12L, fileLen - p).toInt
      s.readFully(p, hdr, 0, want)
      val idv = elementId(hdr, 0)
      if (idv == null || idv._2 >= want) return null
      val szv = varint(hdr, idv._2)
      if (szv == null || idv._2 + szv._2 > want) return null
      (idv._1, p + idv._2 + szv._2, szv._1)
    }
    /** Declared payload end, or −1 for unknown size. */
    def endOf(h: (Long, Long, Long)): Long =
      if (h._3 < 0) -1L else h._2 + h._3
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    // top level: hop to the Segment; overruns AND unknown size clamp to
    // the file (same semantics as the in-memory findSegment)
    var p = 0L
    var seg: (Long, Long) = null
    while (seg == null && p < fileLen) {
      val h = header(p)
      if (h == null) return Nil
      if (h._1 == 0x18538067L)
        seg = (h._2,
          if (h._3 < 0) fileLen else math.min(endOf(h), fileLen))
      else if (h._3 < 0 || endOf(h) > fileLen) return Nil
      else p = endOf(h)
    }
    if (seg == null) return Nil
    var q = seg._1
    var trackNum = -1L
    var blockIdx = 0L
    while (q < seg._2) {
      val h = header(q)
      if (h == null) return out.toSeq
      val hEnd = endOf(h)
      if (hEnd < 0 || hEnd > seg._2) return out.toSeq // cut-short/unknown: keep prior
      h._1 match {
        case 0x1654AE6BL if trackNum < 0 => // FIRST Tracks only (parity
          // with the in-memory walk): tiny — fetch whole, reuse the parser
          val tSz = hEnd - h._2
          if (tSz > maxTracksBytes || tSz > Int.MaxValue - 16) return out.toSeq
          val tb = new Array[Byte](tSz.toInt)
          s.readFully(h._2, tb, 0, tb.length)
          trackNum = videoTrackNum(tb, 0L, tSz).getOrElse(return out.toSeq)
          if (trackNum <= 0) return out.toSeq // track 0 is not addressable
        case 0x1F43B675L if trackNum > 0 => // Cluster: hop block headers
          var clusterTs = -1L
          var b = h._2
          while (b < hEnd) {
            val bh = header(b)
            if (bh == null) return out.toSeq
            val bhEnd = endOf(bh)
            if (bhEnd < 0 || bhEnd > hEnd) return out.toSeq
            bh._1 match {
              case 0xE7L if clusterTs < 0 => // cluster Timestamp: an EBML
                // uint, 1..8 bytes (zero-length is malformed — the
                // in-memory ebmlUint rejects it too). FIRST Timestamp
                // wins: the in-memory walk reads only the first 0xE7
                // child, so a non-canonical second Timestamp is IGNORED
                // here too (parity, not leniency — re-basing on it would
                // shift every later block's ts_ms vs the in-memory rows)
                val n = (bhEnd - bh._2).toInt
                if (n < 1 || n > 8) return out.toSeq
                s.readFully(bh._2, hdr, 0, n)
                var v = 0L
                var k = 0
                while (k < n) { v = (v << 8) | (hdr(k) & 0xFFL); k += 1 }
                clusterTs = v
              case 0xA3L if clusterTs >= 0 => // SimpleBlock header only
                val want = math.min(12L, bhEnd - bh._2).toInt
                if (want < 4) return out.toSeq
                s.readFully(bh._2, hdr, 0, want)
                val tn = varint(hdr, 0, sizeContext = false)
                if (tn == null || tn._2 + 3 > want) return out.toSeq
                if (tn._1 == trackNum) {
                  val rel = (((hdr(tn._2) & 0xFF) << 8) |
                    (hdr(tn._2 + 1) & 0xFF)).toShort.toLong
                  val flags = hdr(tn._2 + 2) & 0xFF
                  val dataS = bh._2 + tn._2 + 3
                  out += new GenericRowWithSchema(Array[Any](
                    id, blockIdx, dataS, bhEnd - dataS, clusterTs + rel,
                    (flags & 0x80) != 0, trackNum), outSchema)
                  blockIdx += 1
                }
              case 0xA3L => // block before the cluster Timestamp: out of
                // the subset (the universal layout puts Timestamp
                // first) — stop rather than emit rows the in-memory
                // walk would index differently
                return out.toSeq
              case _ => ()
            }
            b = bhEnd
          }
          // a cluster that ended without a Timestamp is malformed in
          // BOTH walks (the in-memory form aborts on it too — parity)
          if (clusterTs < 0) return out.toSeq
        case _ => ()
      }
      q = hEnd
    }
    out.toSeq
  }

  /** [[sampleMkvFrames]] over ON-DISK files — the ranged, intra-file-
    * parallel form (the `sampleMp4FramesRangedParallel` shape on the
    * EBML grammar): phase 1 resolves block tables per file via the
    * ranged header hops ([[mkvBlockTableRanged]] — headers only, frame
    * payloads untouched), phase 2 RANGE-partitions the stride-kept
    * blocks on (path, offset) and fetches + decodes each payload by
    * positioned read — a giant clip's decodes spread across tasks,
    * every partition a contiguous offset slice (one reused stream).
    * The narrow kept relation is severed before range partitioning
    * (RangePartitioner's sampling job would re-run the header walk),
    * and duplicate ids are refused like the MP4 form (the id-keyed
    * phase-2 join would fetch from the wrong file). Per-frame error
    * accounting; decode failures are the codec's data verdict. */
  def sampleMkvFramesRanged(files: DataFrame, pathCol: String, idCol: String,
                            stride: Int,
                            unresolvedCounter: Option[
                              org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    MultimodalOps.rangedFrameDecodeCore(files, pathCol, idCol,
      "sampleMkvFramesRanged", unresolvedCounter) {
      mkvBlockTableRanged(files, pathCol, idCol, unresolvedCounter)
        .filter(col("block_idx") % stride === 0)
        .select(col("media_id"), col("block_idx").as("frame_idx"),
          col("offset"), col("size"))
    }
  }

  /** Block-table-driven frame sampling + REAL decode — the MKV twin of
    * `sampleMp4Frames`: blocks with index ≡ 0 (mod stride) slice their
    * payload by the RESOLVED (offset, size) and decode through the
    * same shared ImageIO path. */
  def sampleMkvFrames(df: DataFrame, contentCol: String, idCol: String,
                      stride: Int,
                      unresolvedCounter: Option[
                        org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val tally = new MultimodalOps.MediaUnresolvedTally(unresolvedCounter,
        "sampleMkvFrames")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(
          try walkOne(id, bytes, MkvBlockSchema)
          catch { case _: IndexOutOfBoundsException => Nil }).iterator
          .filter(_.getLong(1) % stride == 0)
          .flatMap { s =>
            val off = s.getLong(2).toInt; val sz = s.getLong(3).toInt
            (try MultimodalOps.frameChannelSums(
              java.util.Arrays.copyOfRange(bytes, off, off + sz))
            catch {
              case _: java.io.IOException => tally.undecodable(); None
              case scala.util.control.NonFatal(_) =>
                tally.undecodable(); None
            }).map { case (w, h, sr, sg, sb) =>
              new GenericRowWithSchema(Array[Any](
                id, s.getLong(1), w, h, sr, sg, sb), outSchema): Row
            }
          }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }
}
