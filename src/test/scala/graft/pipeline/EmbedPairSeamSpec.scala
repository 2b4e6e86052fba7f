package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pair-generator seam: triplet mining and transitive dedup accept
  * a caller-supplied pair relation, and feeding them the default
  * generator's output reproduces the built-in entry points exactly —
  * so swapping in the banded generator changes ONLY candidate recall,
  * never the downstream machinery. */
class EmbedPairSeamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", transform(col("embedding"), x => x.cast("float")))

  private val corpus = vecs((0L until 40L).map { i =>
    val base = (0 until 6).map(j => (((i / 2) * 29 + j * 13) % 17).toDouble - 8.0)
    (i, if (i % 2 == 1) base.updated(1, base(1) + 0.4) else base)
  })

  private val oneCell = Seq((0L, Seq.fill(6)(100L))).toDF("cent_id", "cent_v")

  test("mineTripletsFromPairs(default pairs) == mineTriplets") {
    val direct = SimilarityOps.mineTriplets(corpus, "vec_id", "embedding",
        oneCell, posThreshold = 0.9, negThreshold = 0.5, maxNegPool = 8)
      .collect().map(_.toSeq).toSet
    val seamed = SimilarityOps.mineTripletsFromPairs(corpus, "vec_id",
        "embedding", oneCell,
        SimilarityOps.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.9),
        negThreshold = 0.5, maxNegPool = 8)
      .collect().map(_.toSeq).toSet
    assert(direct == seamed && direct.nonEmpty)
  }

  test("banded positives through the seam can only widen the anchor set") {
    val single = SimilarityOps.mineTriplets(corpus, "vec_id", "embedding",
        oneCell, posThreshold = 0.9, negThreshold = 0.5, planes = 12,
        maxNegPool = 8)
      .select("anchor_id").collect().map(_.getLong(0)).toSet
    val banded = SimilarityOps.mineTripletsFromPairs(corpus, "vec_id",
        "embedding", oneCell,
        SimilarityOps.cosineNearDupPairsBanded(corpus, "vec_id", "embedding",
          0.9, bands = 3, planesPerBand = 4),
        negThreshold = 0.5, maxNegPool = 8)
      .select("anchor_id").collect().map(_.getLong(0)).toSet
    // banded pairs ⊇ single-bucket pairs over the same planes, so every
    // single-bucket anchor keeps a positive (its top-1 may improve)
    assert(single.subsetOf(banded))
  }

  test("dedupEmbedTransitiveFromPairs(default pairs) == dedupEmbedTransitive") {
    val direct = SimilarityOps.dedupEmbedTransitive(corpus, "vec_id",
        "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val seamed = SimilarityOps.dedupEmbedTransitiveFromPairs(corpus, "vec_id",
        SimilarityOps.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(direct == seamed)
  }

  /** Run `f` with stderr captured, returning (result, captured text). */
  private def capturingStderr[T](f: => T): (T, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try { val r = f; (r, buf.toString) }
    finally System.setErr(old)
  }

  test("cap-vs-keyspace: a cap that drops most rows warns loudly; " +
    "a healthy cap stays silent") {
    // 40 non-zero vectors into 2^1 = 2 buckets with cap 2: every bucket
    // is over cap (pigeonhole) -> near-empty result + the loud warning
    val (rows, err) = capturingStderr {
      SimilarityOps.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, planes = 1, maxBucketFreq = 2).count()
    }
    assert(rows == 0L, "all buckets over cap must yield no pairs")
    assert(err.contains("[graft]") && err.contains("key space") &&
      err.contains("2^1"), s"expected the pigeonhole warning, got: $err")

    // same corpus, banded form, cap that drops everything -> same guard
    val (bRows, bErr) = capturingStderr {
      SimilarityOps.cosineNearDupPairsBanded(corpus, "vec_id", "embedding",
        threshold = 0.9, bands = 2, planesPerBand = 1, maxBandFreq = 2).count()
    }
    assert(bRows == 0L)
    assert(bErr.contains("[graft]") && bErr.contains("key space"))

    // a cap the corpus fits under: no warning, pairs found
    val (okRows, okErr) = capturingStderr {
      SimilarityOps.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, planes = 6, maxBucketFreq = 1000).count()
    }
    assert(okRows > 0L)
    assert(!okErr.contains("key space"), s"unexpected warning: $okErr")
  }

  test("planesFor sizes the key space to the corpus and cap") {
    // the scaladoc'd default ceiling: 640k vectors at the shipped cap
    // with 4x headroom needs 2^8 buckets, not the 2^6 default
    assert(SimilarityOps.planesFor(640000L) == 8)
    // tiny corpora clamp at 1; the inequality holds at the returned p
    assert(SimilarityOps.planesFor(1L) == 1)
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L); cap <- Seq(16, 10000)) {
      val p = SimilarityOps.planesFor(n, cap)
      if (p < 48)
        assert((1L << p) >= 4L * n / cap, s"n=$n cap=$cap p=$p")
    }
    // a 100-TB-ish corpus at a small cap exhausts sign-LSH: clamped 48
    assert(SimilarityOps.planesFor(Long.MaxValue / 8, 16) == 48)
    // margin·n past Long range must still signal exhaustion, not wrap
    // to a tiny key space
    assert(SimilarityOps.planesFor(Long.MaxValue, 16, margin = 8) == 48)
  }
}
