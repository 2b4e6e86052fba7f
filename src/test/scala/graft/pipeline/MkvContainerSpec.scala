package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Matroska/EBML: the general-varint walk against the fixed-layout
  * formulas, honest CLUSTER-granularity truncation (a cut keeps every
  * fully contained cluster's blocks — the Segment's declared extent is
  * clamped, since live-streaming MKVs even declare unknown size),
  * garbage accounting, and the shared frame pipeline over a sixth
  * container. */
class MkvContainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L, 5L, 8L)

  /** Formula twin: (block_idx, offset, size, ts_ms, is_key, track). */
  private def expected(id: Long): Seq[(Long, Long, Long, Long, Boolean, Long)] = {
    var clusterStart = 65L
    var i = 0L
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Boolean, Long)]
    for (c <- 0 until MkvOps.synthMkvClusters(id)) {
      val m = MkvOps.synthMkvClusterBlocks(id, c)
      var off = clusterStart + 18
      var sC = 0L
      for (j <- 0 until m) {
        val sz = MkvOps.synthMkvBlockSize(id, i.toInt).toLong
        out += ((i, off, sz, c * 1000L + j * 40L, j == 0, 1L))
        off += 7 + sz; sC += 7 + sz; i += 1
      }
      clusterStart += 11 + sC
    }
    out.toSeq
  }

  private def walk(df: org.apache.spark.sql.DataFrame) =
    MkvOps.mkvBlockTable(df, "content", "media_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("the walker resolves SimpleBlocks exactly as the formulas predict") {
    val got = walk(MkvOps.encodeSyntheticMkv(ids.toDF("id"), "id"))
    ids.foreach { id => assert(got.getOrElse(id, Nil) == expected(id), s"id $id") }
  }

  test("truncation at every cut keeps exactly the fully-contained clusters") {
    for (id <- Seq(2L, 3L)) {
      val full = MkvOps.encodeSyntheticMkv(Seq(id).toDF("id"), "id")
        .collect()(0).getAs[Array[Byte]](1)
      val exp = expected(id)
      // cluster extents from the same layout arithmetic
      var clusterStart = 65L
      var i = 0
      val clusterEnd = scala.collection.mutable.Map.empty[Long, Long] // block -> cluster end
      for (c <- 0 until MkvOps.synthMkvClusters(id)) {
        val m = MkvOps.synthMkvClusterBlocks(id, c)
        var sC = 0L
        val blocks = (0 until m).map { _ =>
          val sz = MkvOps.synthMkvBlockSize(id, i).toLong
          sC += 7 + sz; i += 1; i - 1
        }
        val end = clusterStart + 11 + sC
        blocks.foreach(bi => clusterEnd(bi.toLong) = end)
        clusterStart = end
      }
      for (cut <- (0 to full.length by 3) :+ full.length) {
        val part = java.util.Arrays.copyOf(full, cut)
        val got = walk(Seq((id, part)).toDF("media_id", "content"))
          .getOrElse(id, Nil)
        // leading metadata (EBML+Segment hdr+Info+Tracks = 65 bytes)
        // must be intact for ANY block to resolve
        val want =
          if (cut < 65) Nil
          else exp.takeWhile { case (bi, _, _, _, _, _) => clusterEnd(bi) <= cut }
        assert(got == want, s"id $id cut $cut")
      }
    }
  }

  test("garbage is counted; valid files flow; general varints really parse") {
    val acc = spark.sparkContext.longAccumulator("mkv-acct-test")
    val mixed = MkvOps.encodeSyntheticMkv(ids.toDF("id"), "id")
      .unionByName(Seq((700L, Array.fill[Byte](48)(0x6C)))
        .toDF("media_id", "content"))
    val rows = MkvOps.mkvBlockTable(mixed, "content", "media_id", Some(acc))
      .collect()
    assert(acc.value == 1L)
    assert(rows.map(_.getLong(0)).toSet == ids.toSet)
  }

  test("the ranged walk resolves blocks identically from header hops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mkv").toString
    graft.sources.TableSources.writeBinaryDir(
      MkvOps.encodeSyntheticMkv(ids.toDF("id"), "id"),
      dir, "media_id", "content", ".mkv")
    val files = graft.sources.TableSources.listBinaryDir(spark, dir, "*.mkv")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mkv$", 1).cast("long"))
    val ranged = MkvOps.mkvBlockTableRanged(files, "media_path", "media_id")
      .collect().map(_.toSeq).toSet
    val inMem = MkvOps.mkvBlockTable(
        MkvOps.encodeSyntheticMkv(ids.toDF("id"), "id"), "content", "media_id")
      .collect().map(_.toSeq).toSet
    assert(ranged == inMem && ranged.nonEmpty)
    // a ghost file resolves to no rows, counted
    val acc = spark.sparkContext.longAccumulator("mkv-ranged-acct")
    assert(MkvOps.mkvBlockTableRanged(
      Seq((7L, s"$dir/missing.mkv")).toDF("media_id", "media_path"),
      "media_path", "media_id", Some(acc)).count() == 0L)
    assert(acc.value == 1L)
  }

  /** Call both walkers directly on the same bytes — the ranged one via
    * a real local-FS file — and demand identical rows. */
  private def bothWalks(id: Long, bytes: Array[Byte]): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val inMem = MkvOps.walkOne(id, bytes, MkvOps.MkvBlockSchema).map(_.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("mkv-diff")
    val p = dir.resolve("x.mkv")
    java.nio.file.Files.write(p, bytes)
    val hp = new org.apache.hadoop.fs.Path(p.toString)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    val ranged =
      try MkvOps.mkvRangedWalk(in, bytes.length.toLong, id, 1L << 20,
        MkvOps.MkvBlockSchema).map(_.toSeq)
      finally in.close()
    java.nio.file.Files.deleteIfExists(p); java.nio.file.Files.deleteIfExists(dir)
    (inMem, ranged)
  }

  test("DIFFERENTIAL sweep: in-memory and ranged agree at every cut and " +
    "on crafted malformed shapes") {
    for (id <- Seq(2L, 3L)) {
      val full = MkvOps.encodeSyntheticMkv(Seq(id).toDF("id"), "id")
        .collect()(0).getAs[Array[Byte]](1)
      for (cut <- (0 to full.length by 5) :+ full.length) {
        val part = java.util.Arrays.copyOf(full, cut)
        val (a, b) = bothWalks(id, part)
        assert(a == b, s"id $id cut $cut: in-memory $a vs ranged $b")
      }
      // crafted: unknown-size Segment (0xFF size varint) — both clamp
      val unknown = full.clone()
      // segment header is 4-byte ID + 2-byte size at a fixed position:
      // find it (0x18 0x53 0x80 0x67) and overwrite its size with 0xFF + pad
      val segAt = (0 until full.length - 4).find(i =>
        (full(i) & 0xFF) == 0x18 && (full(i + 1) & 0xFF) == 0x53 &&
          (full(i + 2) & 0xFF) == 0x80 && (full(i + 3) & 0xFF) == 0x67).get
      // replace the 2-byte size with a 1-byte unknown (0xFF) and shift
      val shifted = unknown.take(segAt + 4) ++ Array(0xFF.toByte) ++
        unknown.drop(segAt + 6)
      val (ua, ub) = bothWalks(id, shifted)
      assert(ua == ub, s"unknown-size segment: $ua vs $ub")
      assert(ua.nonEmpty, "unknown-size segment must clamp, not reject")
      // crafted: cluster whose Timestamp payload is 9 bytes (oversized)
      val tsAt = (segAt until full.length - 2).find(i =>
        (full(i) & 0xFF) == 0xE7 && (full(i + 1) & 0xFF) == 0x40 &&
          (full(i + 2) & 0xFF) == 0x02).get
      val bad = full.clone()
      bad(tsAt + 2) = 0x09 // declare 9 payload bytes
      val (ta, tb) = bothWalks(id, bad)
      assert(ta == tb, s"oversized timestamp: $ta vs $tb")

      // layout facts the next two shapes lean on: EBML hdr [0,18),
      // Segment hdr [18,24), Info [24,38), Tracks [38,65), clusters
      // from 65; cluster = 6 hdr + 5 ts element + blocks of 7+size
      val c1Blocks = MkvOps.synthMkvClusterBlocks(id, 0)
      val c1Size = 11L + (0 until c1Blocks)
        .map(j => 7L + MkvOps.synthMkvBlockSize(id, j)).sum
      val c2Start = (65L + c1Size).toInt

      // crafted: a Cluster BEFORE Tracks (non-canonical order) — BOTH
      // walks must skip it and resolve the clusters after Tracks (the
      // round-13 in-memory walk resolved it via lookahead; divergence)
      val reordered = full.take(38) ++
        full.slice(65, c2Start) ++ full.slice(38, 65) ++ full.drop(c2Start)
      assert(reordered.length == full.length)
      val (ra, rb) = bothWalks(id, reordered)
      assert(ra == rb, s"cluster-before-tracks: $ra vs $rb")
      assert(ra.size == expected(id).size - c1Blocks,
        s"clusters after Tracks must still resolve: got ${ra.size}")

      // crafted: ZERO-length cluster Timestamp on the second cluster —
      // malformed in both walks (the round-13 ranged walk read it as
      // ts=0); prefix discipline keeps exactly cluster 1's blocks
      assert((full(c2Start + 6) & 0xFF) == 0xE7 &&
        (full(c2Start + 7) & 0xFF) == 0x40 && (full(c2Start + 8) & 0xFF) == 0x02)
      val zeroTs = full.clone()
      zeroTs(c2Start + 8) = 0x00
      val (za, zb) = bothWalks(id, zeroTs)
      assert(za == zb, s"zero-length timestamp: $za vs $zb")
      assert(za.size == c1Blocks,
        s"prefix must keep exactly cluster 1, got ${za.size}")

      // crafted: a SECOND Timestamp inside cluster 2 (after its first
      // block) — non-canonical; the FIRST Timestamp must win in BOTH
      // walks (round-13's ranged walk re-based every later block on it)
      def withInsertedE7(payload: Array[Byte]): Array[Byte] = {
        val blockLen = 7 + MkvOps.synthMkvBlockSize(id, c1Blocks)
        val at = c2Start + 11 + blockLen
        val out = full.take(at) ++ payload ++ full.drop(at)
        // cluster 2's 2-byte size (after its 4-byte ID) and the
        // Segment's (at file offset 22) both grow by the insert
        def bump(pos: Int): Unit = {
          val old = ((out(pos) & 0x3F) << 8) | (out(pos + 1) & 0xFF)
          val v = old + payload.length
          out(pos) = (0x40 | (v >> 8)).toByte; out(pos + 1) = (v & 0xFF).toByte
        }
        bump(c2Start + 4); bump(22)
        out
      }
      // poison base 3000: legitimate bases are c·1000 with ≤ 3 clusters
      // and rel < 1000, so no real row can reach 3000
      val twoTs = withInsertedE7(
        Array(0xE7, 0x40, 0x02, 0x0B, 0xB8).map(_.toByte)) // ts = 3000
      val (da, db) = bothWalks(id, twoTs)
      assert(da == db, s"double timestamp: $da vs $db")
      assert(da.size == expected(id).size, "all blocks must still resolve")
      // cluster 2's blocks keep the FIRST timestamp's base (1000):
      // ts_ms column (index 4) of its first block stays 1000
      assert(da.map(_(4)).contains(1000L),
        s"first-timestamp base must win: ${da.map(_(4))}")
      assert(!da.map(_(4)).exists(_.asInstanceOf[Long] >= 3000L),
        s"the second timestamp must be ignored: ${da.map(_(4))}")
      // crafted: a second, ZERO-LENGTH Timestamp — ignored in both
      // walks (it is not the cluster's first; round-13's ranged walk
      // aborted the whole remainder on it)
      val (ea, eb) = bothWalks(id,
        withInsertedE7(Array(0xE7, 0x40, 0x00).map(_.toByte)))
      assert(ea == eb, s"zero-length second timestamp: $ea vs $eb")
      assert(ea.size == expected(id).size,
        "a non-first malformed timestamp must not cut the walk")
    }

    // crafted: track number 127 — its minimal varint encoding is 0xFF,
    // the same bit pattern as RFC 8794's unknown-size sentinel; in the
    // block's TRACK field it is a legal value and both walks must match
    // the blocks rather than dropping them as a non-matching track
    val frames = IndexedSeq(Array.tabulate[Byte](24)(_.toByte),
      Array.tabulate[Byte](30)(j => (j * 3).toByte))
    val t127 = MkvOps.buildMkv(Seq(frames, frames.take(1)), trackNum = 127)
    val (fa, fb) = bothWalks(42L, t127)
    assert(fa == fb, s"track-127: $fa vs $fb")
    assert(fa.size == 3, s"all three track-127 blocks must resolve: $fa")
    assert(fa.forall(_.last == 127L), s"track_num must be 127: $fa")
  }

  test("the frame pipeline runs container-blind over EBML") {
    val got = MkvOps.sampleMkvFrames(
      MkvOps.encodeSyntheticMkvVideo(ids.toDF("id"), "id"),
      "content", "media_id", 2).collect().map(_.toSeq).toSet
    val viaMp4 = MultimodalOps.sampleMp4Frames(
      MultimodalOps.encodeSyntheticMp4Video(ids.toDF("id"), "id"),
      "content", "media_id", 2).collect().map(_.toSeq).toSet
    assert(got == viaMp4 && got.nonEmpty)
  }

  test("the ranged + intra-file-parallel MKV frame decode matches the " +
    "in-memory form; ghost files count, duplicate ids refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mkvv").toString
    graft.sources.TableSources.writeBinaryDir(
      MkvOps.encodeSyntheticMkvVideo(ids.toDF("id"), "id"),
      dir, "media_id", "content", ".mkv")
    val files = graft.sources.TableSources.listBinaryDir(spark, dir, "*.mkv")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mkv$", 1)
          .cast("long"))
    val inMem = MkvOps.sampleMkvFrames(
      MkvOps.encodeSyntheticMkvVideo(ids.toDF("id"), "id"),
      "content", "media_id", 2).collect().map(_.toSeq).toSet
    val ranged = MkvOps.sampleMkvFramesRanged(
      files, "media_path", "media_id", 2).collect().map(_.toSeq).toSet
    assert(ranged == inMem && ranged.nonEmpty)
    val acc = spark.sparkContext.longAccumulator("mkvv-ranged-acct")
    assert(MkvOps.sampleMkvFramesRanged(
      Seq((7L, s"$dir/missing.mkv")).toDF("media_id", "media_path"),
      "media_path", "media_id", 2, Some(acc)).count() == 0L)
    assert(acc.value == 1L)
    val somePath = files.limit(1).collect()(0).getString(0)
    val e = intercept[IllegalArgumentException] {
      MkvOps.sampleMkvFramesRanged(
        Seq((3L, somePath), (3L, somePath)).toDF("media_id", "media_path"),
        "media_path", "media_id", 2).count()
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
