package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REAL WAV round-trip: formula clips through the manual RIFF encoder,
  * back through BOTH readers — the columnar header parse and the JDK's
  * real PCM decoder — each checked against the generator formulas. */
class AudioDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("encode -> JDK decode recovers the formula samples exactly") {
    val wav = MultimodalOps.encodeSyntheticWav(ids(40), "id")
    val out = MultimodalOps.decodeAudioFeatures(wav, "content", "media_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    (0L until 40L).foreach { id =>
      val n = MultimodalOps.synthAudioSamples(id)
      val ss = (0 until n).map(i => MultimodalOps.synthSample(id, i).toLong)
      val expect = (true, n.toLong, ss.sum, ss.map(math.abs).sum,
        ss.map(math.abs).max)
      assert(out(id) == expect, s"id=$id")
    }
  }

  test("columnar header parse agrees with the JDK decoder's frame count") {
    val wav = MultimodalOps.encodeSyntheticWav(ids(25), "id")
    val meta = wav.select(col("media_id"),
        MultimodalOps.wavMeta(col("content")).as("m"))
      .select(col("media_id"), col("m.format_ok"), col("m.n_channels"),
        col("m.sample_rate"), col("m.bits_per_sample"), col("m.n_samples"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val dec = MultimodalOps.decodeAudioFeatures(wav, "content", "media_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    meta.foreach { case (id, (ok, ch, sr, bits, n)) =>
      assert(ok && ch == 1L && sr == 8000L && bits == 16L)
      assert(n == dec(id), s"header frame count vs decoded samples, id=$id")
    }
  }

  test("audio fingerprints: shared frame runs share a fingerprint; " +
      "identical clips share all of them") {
    val base = MultimodalOps.encodeSyntheticWav(ids(2), "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // clip 10 = exact copy of clip 1; clip 11 = clip 1 with ONLY its
    // first frame's samples (20 x 2 bytes at offset 44) overwritten
    val mutated = base(1L).clone()
    (44 until 84).foreach(i => mutated(i) = 0x11.toByte)
    val clips = Seq((1L, base(1L)), (10L, base(1L)), (11L, mutated))
      .toDF("media_id", "content")
    val en = MultimodalOps.audioFrameEnergies(clips, "content", "media_id", 20)
    val seqs = en
      .select(col("media_id"), col("frame_idx").as("f"),
        call_function("div", col("energy"), lit(500L)).cast("string").as("t"))
      .groupBy(col("media_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("f"), col("t")))),
        s => s.getField("t")), " ").as("lvl_text"))
    val fps = TextOps.winnowFingerprints(seqs, "lvl_text", "media_id", 3, 4)
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(fps(10L) == fps(1L), "identical clips must share ALL fingerprints")
    assert((fps(11L) & fps(1L)).nonEmpty,
      "clips sharing a >= 6-frame run must share a fingerprint")
    // sanity: the mutation actually changed the level sequence (whether a
    // FINGERPRINT changes depends on which window minima were selected —
    // winnowing's robustness to local edits is the point, not a bug)
    val lvls = seqs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lvls(11L) != lvls(1L))
  }

  test("corrupt and non-WAV payloads fail soft on both readers") {
    val junk = Seq(
      (1L, "not audio at all".getBytes("UTF-8")),
      (2L, Array.fill[Byte](100)(0x7f)),
      (3L, Array.emptyByteArray)).toDF("media_id", "content")
    val dec = MultimodalOps.decodeAudioFeatures(junk, "content", "media_id")
      .collect()
    assert(dec.forall(r => !r.getBoolean(1) && r.isNullAt(2)))
    val meta = junk.select(MultimodalOps.wavMeta(col("content")).as("m"))
      .select(col("m.format_ok"), col("m.n_samples")).collect()
    assert(meta.forall(r => !r.getBoolean(0) && r.isNullAt(1)))
  }

  test("a truncated but well-headed WAV still parses its header honestly") {
    // header claims n samples; JDK reader sees fewer bytes -> decode
    // reports what it actually read, header reports the claim
    val full = MultimodalOps.encodeSyntheticWav(ids(1), "id")
      .collect()(0).getAs[Array[Byte]](1)
    val truncated = full.take(44 + 20) // 10 samples of the claimed 200
    val df = Seq((9L, truncated)).toDF("media_id", "content")
    val m = df.select(MultimodalOps.wavMeta(col("content")).as("m"))
      .select(col("m.format_ok"), col("m.n_samples")).collect()(0)
    assert(m.getBoolean(0) && m.getLong(1) == 200L)
    val d = MultimodalOps.decodeAudioFeatures(df, "content", "media_id").collect()(0)
    assert(d.getBoolean(1) && d.getLong(2) == 10L)
  }
}
