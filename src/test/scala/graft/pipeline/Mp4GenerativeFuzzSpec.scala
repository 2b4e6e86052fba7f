package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generative fuzz over the ISO-BMFF walker: hundreds of RANDOM box
  * trees — nested containers, lying sizes (0, 1/largesize, overruns),
  * truncated leaves, real-looking stbl fragments with garbage counts —
  * shipped through the walker in ONE job. Two invariants survive any
  * input:
  *
  *  1. no exception ever escapes (the blanket contract every corpus
  *     walk honors);
  *  2. every EMITTED sample's payload is fully inside its clip's
  *     buffer (offset ≥ 0, offset + size ≤ length, size ≥ 0) — the
  *     honest-truncation guarantee stated positively: whatever the
  *     metadata claims, the walker never addresses bytes that are not
  *     there.
  *
  * Deterministic LCG (no RNG APIs) so failures replay by seed. */
class Mp4GenerativeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
  }

  private val BoxTypes = Seq("moov", "trak", "mdia", "minf", "stbl",
    "mdhd", "hdlr", "stsd", "stts", "stss", "stsz", "stsc", "stco",
    "co64", "mdat", "free", "junk", "ftyp", "zzzz")
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** One random box tree, depth-limited; sizes sometimes lie. */
  private def genBox(r: Lcg, depth: Int,
                     out: java.io.ByteArrayOutputStream): Unit = {
    val tp = BoxTypes(r.next(BoxTypes.size))
    val body = new java.io.ByteArrayOutputStream()
    if (Containers.contains(tp) && depth < 4) {
      val kids = r.next(4)
      (0 until kids).foreach(_ => genBox(r, depth + 1, body))
    } else {
      val n = r.next(40)
      (0 until n).foreach(_ => body.write(r.next(256)))
    }
    val payload = body.toByteArray
    val lie = r.next(10)
    val declared =
      if (lie == 0) 0 // "to end of enclosing"
      else if (lie == 1) 1 // largesize marker with no largesize field
      else if (lie == 2) 8 + payload.length + 1 + r.next(64) // overrun
      else if (lie == 3) r.next(8) // undersized header
      else 8 + payload.length
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putInt(declared)
    bb.put(tp.getBytes("US-ASCII"))
    out.write(bb.array()); out.write(payload)
  }

  test("random box trees: no escape, every emitted sample in bounds") {
    val cases = (0 until 500).map { seed =>
      val r = new Lcg(seed.toLong * 2654435761L + 17)
      val out = new java.io.ByteArrayOutputStream()
      val boxes = 1 + r.next(5)
      (0 until boxes).foreach(_ => genBox(r, 0, out))
      val bytes = out.toByteArray
      // random truncation on top of the random tree
      val cut = if (r.next(3) == 0) r.next(bytes.length + 1)
                else bytes.length
      seed.toLong -> bytes.take(cut)
    }
    val lens = cases.map { case (id, b) => id -> b.length.toLong }.toMap
    val rows = MultimodalOps.mp4SampleTable(
        cases.toDF("id", "content"), "content", "id")
      .select(col("media_id"), col("offset"), col("size"))
      .collect() // completing the job is invariant 1
    rows.foreach { r =>
      val (id, off, sz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sz >= 0 && off >= 0 && off + sz <= lens(id),
        s"seed=$id emitted out-of-bounds sample (off=$off size=$sz " +
          s"len=${lens(id)})")
    }
  }

  test("random trees that DO contain a valid clip still resolve it") {
    // splice a real encoded clip between two random-garbage siblings at
    // top level: the lenient top walk must still find the moov and
    // resolve the clip's full sample table
    val id = 4L
    val real = MultimodalOps.encodeSyntheticMp4(Seq(id).toDF("id"), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val r = new Lcg(99)
    def junkBox(): Array[Byte] = {
      val n = r.next(32)
      val bb = java.nio.ByteBuffer.allocate(8 + n)
      bb.putInt(8 + n); bb.put("free".getBytes("US-ASCII"))
      (0 until n).foreach(_ => bb.put(r.next(256).toByte))
      bb.array()
    }
    val spliced = junkBox() ++ real ++ junkBox()
    val got = MultimodalOps.mp4SampleTable(
        Seq(id -> spliced).toDF("id", "content"), "content", "id")
      .count()
    // the walk must find the moov behind leading junk and resolve
    // samples (stco offsets are absolute within the ORIGINAL encoding,
    // so a splice without offset rewriting shifts payload positions —
    // a real remuxer rewrites stco; the walker's job is the table)
    assert(got > 0, s"spliced clip resolved $got samples")
  }
}
