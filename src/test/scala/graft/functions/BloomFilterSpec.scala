package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the bloom kernel + the bloom-screened contamination
  * variant: zero false negatives (that's what makes bloom-screened
  * results bit-identical to their exact oracles), bounded false
  * positives, and screen ≡ screenBloom on real-shaped data. */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val numBits = 1 << 16
  private val numHashes = 4

  /** Deterministic pseudo-random probe values (test data only). */
  private def scramble(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("no false negatives: every inserted hash probes true") {
    val hashes = (0 until 5000).map(i => scramble(i.toLong))
    val df = hashes.toDF("h")
    val words = BloomFilter.build(df, "h", numBits, numHashes)
    val missed = df
      .filter(!BloomFilter.mightContainCol(col("h"), words, numHashes, numBits))
      .count()
    assert(missed == 0L)
  }

  test("false-positive rate stays near theory") {
    val inserted = (0 until 4000).map(i => scramble(i.toLong))
    val words = BloomFilter.build(inserted.toDF("h"), "h", numBits, numHashes)
    val probes = (1000000 until 1020000).map(i => scramble(i.toLong))
    val fp = probes.toDF("h")
      .filter(BloomFilter.mightContainCol(col("h"), words, numHashes, numBits))
      .count()
    // m=65536, k=4, n=4000 → theoretical fpp = (1-e^{-kn/m})^k ≈ 0.0023;
    // assert with ~4× headroom so the bound is sampling-noise-proof.
    val fpp = fp.toDouble / 20000
    assert(fpp < 0.01, s"fpp=$fpp too high for m=$numBits k=$numHashes n=4000")
  }

  test("interpreted eval matches codegen kernel") {
    // nullSafeEval path (e.g. under ConstantFolding) must agree with the
    // generated-code path; probe both against the same bitmap.
    val words = BloomFilter.build(Seq(42L, 7L).toDF("h"), "h", 64, 2)
    val e = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(42L), words, 2, 64)
    assert(e.eval(null) == true)
    assert(BloomFilter.mightContain(42L, words, 2, 64))
    assert(BloomFilter.mightContain(7L, words, 2, 64))
  }

  test("bloom-screened contamination ≡ exact contamination screen") {
    val docs = ((0L until 40L).map(i =>
      (i, s"unique filler content row $i about topic ${i % 7} and more words here")) ++
      Seq((100L, "shared overlapping passage of many common tokens appearing verbatim in both"),
        (194L, "shared overlapping passage of many common tokens appearing verbatim in both")))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = graft.pipeline.TextOps
      .contaminationScreen(docs, bench, "text", "doc_id", 3, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = graft.pipeline.TextOps
      .contaminationScreenBloom(docs, bench, "text", "doc_id", 3, 3L,
        numBits = 1 << 12, numHashes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact == bloomed)
    assert(exact.nonEmpty) // the planted overlap must actually flag
    assert(exact.exists { case (t, b, _) => t == 100L && b == 194L })
  }

  test("build rejects out-of-contract shapes loudly") {
    val df = Seq(1L).toDF("h")
    intercept[IllegalArgumentException] {
      BloomFilter.build(df, "h", 100, 4) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      BloomFilter.build(df, "h", 1 << 28, 4) // above the 16 MB cap
    }
    intercept[IllegalArgumentException] {
      BloomFilter.build(df, "h", 64, 0) // zero hashes
    }
  }
}
