package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-corruption shapes for the MP4 sample-table guards that
  * generative fuzzing essentially never reaches (none of them survive
  * to a 'vide' hdlr by chance): a uniform-stsz header claiming ~2^31
  * samples (the multi-GB-allocation shape — pre-guard, the tabulate
  * would OOM the executor with an Error the parse-failure catches
  * can't see), a uniform size × count product past the addressed
  * payload, wrapped (negative-as-int) stss/stco counts, and a
  * near-Long.MaxValue co64 chunk offset whose `off + sz` wraps
  * negative past a naive bound check. Each pins the honest outcome:
  * unresolvable tables count the FILE via the tally and yield no rows;
  * the co64 overflow prefix-stops keeping the fully-addressed leading
  * samples. The EBML walk got this discipline in MkvContainerSpec;
  * this is the ISO-BMFF twin. */
class Mp4CraftedCorruptionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** File offset of the box whose fourcc is `tp`, scanning from the END
    * (the default camera layout is ftyp+mdat+moov, so the moov's tables
    * sit after any payload bytes that could shadow a fourcc). */
  private def boxAt(b: Array[Byte], tp: String): Int = {
    val pat = tp.getBytes("US-ASCII")
    var p = b.length - 4
    while (p >= 0) {
      if (b(p) == pat(0) && b(p + 1) == pat(1) &&
          b(p + 2) == pat(2) && b(p + 3) == pat(3)) return p - 4
      p -= 1
    }
    fail(s"no '$tp' box in the crafted file")
  }
  private def putU32(b: Array[Byte], pos: Int, v: Long): Unit = {
    b(pos) = ((v >>> 24) & 0xFF).toByte; b(pos + 1) = ((v >>> 16) & 0xFF).toByte
    b(pos + 2) = ((v >>> 8) & 0xFF).toByte; b(pos + 3) = (v & 0xFF).toByte
  }
  private def putU64(b: Array[Byte], pos: Int, v: Long): Unit = {
    putU32(b, pos, v >>> 32); putU32(b, pos + 4, v & 0xFFFFFFFFL)
  }

  private def mp4Bytes(id: Long): Array[Byte] =
    MultimodalOps.encodeSyntheticMp4(Seq(id).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)

  private def walk(id: Long, bytes: Array[Byte]) = {
    val acc = spark.sparkContext.longAccumulator(s"mp4-crafted-$id")
    val rows = MultimodalOps.mp4SampleTable(
      Seq((id, bytes)).toDF("media_id", "content"),
      "content", "media_id", Some(acc)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    (rows, acc.value)
  }

  test("uniform stsz claiming ~2^31 samples is rejected before any " +
    "allocation: zero rows, file counted") {
    val id = 2L // even: stco layout
    val full = mp4Bytes(id)
    assert(walk(id, full)._1.size == MultimodalOps.synthMp4Samples(id))
    val bad = full.clone()
    val stsz = boxAt(bad, "stsz")
    putU32(bad, stsz + 12, 1L)          // uniform sample_size = 1
    putU32(bad, stsz + 16, 0x7FFFFFFFL) // sample_count ≈ 2^31
    val (rows, tallied) = walk(id, bad)
    assert(rows.isEmpty && tallied == 1L,
      s"huge uniform nSamples must reject + tally, got ${rows.size}/$tallied")
  }

  test("uniform size × count past the addressed payload is rejected " +
    "(the ranged-walk shape, where the file length can't bound the count)") {
    val id = 2L
    val bad = mp4Bytes(id).clone()
    val stsz = boxAt(bad, "stsz")
    putU32(bad, stsz + 12, 1L << 30) // 1 GiB per sample
    putU32(bad, stsz + 16, 1000L)    // under the flat cap — product must catch it
    val (rows, tallied) = walk(id, bad)
    assert(rows.isEmpty && tallied == 1L)
  }

  test("a wrapped stss count (u32 reading negative as Int) rejects the " +
    "table instead of silently marking every sample non-sync") {
    val id = 2L
    val bad = mp4Bytes(id).clone()
    val stss = boxAt(bad, "stss")
    putU32(bad, stss + 12, 0xFFFFFFFFL) // entry_count wraps to -1
    val (rows, tallied) = walk(id, bad)
    assert(rows.isEmpty && tallied == 1L,
      s"wrapped stss count must reject + tally, got ${rows.size}/$tallied")
  }

  test("a wrapped stco count rejects the table") {
    val id = 2L
    val bad = mp4Bytes(id).clone()
    val stco = boxAt(bad, "stco")
    putU32(bad, stco + 12, 0xFFFFFFFFL)
    val (rows, tallied) = walk(id, bad)
    assert(rows.isEmpty && tallied == 1L)
  }

  test("a near-Long.MaxValue co64 chunk offset prefix-stops instead of " +
    "wrapping past the payload bound") {
    val id = 1L // odd: co64 layout
    val full = mp4Bytes(id)
    val (whole, _) = walk(id, full)
    val k = MultimodalOps.synthMp4Samples(id)
    val c1 = (k + 1) / 2
    assert(whole.size == k)
    val bad = full.clone()
    val co64 = boxAt(bad, "co64")
    // chunk offsets start at payload+8 = box+16, 8 bytes each; poison
    // chunk 2 so off + size wraps negative
    putU64(bad, co64 + 16 + 8, Long.MaxValue - 2)
    val (rows, tallied) = walk(id, bad)
    assert(rows == whole.take(c1),
      s"must keep exactly chunk 1's $c1 samples, got ${rows.size}")
    assert(tallied == 0L, "a file that yielded samples is not tallied")
  }
}
