package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded sign-LSH contract: superset recall over the single bucket on
  * the same planes, one verified row per pair regardless of how many
  * bands agree, and the hot-band cap dropping boilerplate directions
  * without losing under-cap pairs. */
class BandedNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", transform(col("embedding"), x => x.cast("float")))

  // a deterministic spread of directions with a few genuine near-dups
  private def corpus(n: Int) = vecs((0L until n.toLong).map { i =>
    val base = (0 until 8).map(j => (((i / 2) * 31 + j * 17) % 19).toDouble - 9.0)
    // odd ids perturb their even twin slightly -> high-cosine pair
    val v = if (i % 2 == 1) base.updated(0, base(0) + 0.5) else base
    (i, v)
  })

  test("banded pairs are a superset of the single bucket over the same planes") {
    val df = corpus(60)
    val banded = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.8, bands = 3, planesPerBand = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = SimilarityOps.cosineNearDupPairs(
        df, "vec_id", "embedding", 0.8, planes = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 12 planes agreeing implies every 4-plane band agrees
    assert(single.subsetOf(banded),
      s"missing from banded: ${(single -- banded).take(5)}")
    assert(banded.nonEmpty)
  }

  test("bands = 1 degenerates to exactly the single-bucket pairs") {
    val df = corpus(40)
    val banded = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.5, bands = 1, planesPerBand = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = SimilarityOps.cosineNearDupPairs(
        df, "vec_id", "embedding", 0.5, planes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(banded == single)
  }

  test("one row per pair even when every band agrees (exact duplicates)") {
    val df = vecs(Seq(
      1L -> Seq(1.0, 2.0, 3.0, 4.0),
      2L -> Seq(1.0, 2.0, 3.0, 4.0),   // identical -> all 3 bands agree
      3L -> Seq(-4.0, 3.0, -2.0, 1.0)))
    val out = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.9, bands = 3, planesPerBand = 4)
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-9)
  }

  test("hot-band cap drops a boilerplate direction; under-cap pairs survive") {
    // 30 identical vectors concentrate every band bucket they touch;
    // one genuine pair on a different direction stays under the cap
    val boiler = (0L until 30L).map(i => i -> Seq(5.0, 5.0, 5.0, 5.0))
    val real = Seq(
      100L -> Seq(-3.0, 4.0, -5.0, 6.0),
      101L -> Seq(-3.0, 4.0, -5.0, 6.1))
    val df = vecs(boiler ++ real)
    val capped = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.9, bands = 3, planesPerBand = 4,
        maxBandFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"expected only the under-cap pair, got ${capped.take(5)}")
    val uncapped = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.9, bands = 3, planesPerBand = 4)
      .collect().length
    assert(uncapped == 435 + 1) // C(30,2) boilerplate pairs + the real one
  }

  test("zero vectors are excluded from banding entirely") {
    val df = vecs(Seq(
      1L -> Seq(0.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 0.0, 0.0, 0.0),
      3L -> Seq(1.0, 2.0, 3.0, 4.0),
      4L -> Seq(1.0, 2.0, 3.0, 4.0)))
    val out = SimilarityOps.cosineNearDupPairsBanded(
        df, "vec_id", "embedding", 0.5, bands = 2, planesPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((3L, 4L)))
  }

  test("geometry contract: bands x planes must stay within the family") {
    val df = vecs(Seq(1L -> Seq(1.0, 2.0)))
    intercept[IllegalArgumentException] {
      SimilarityOps.cosineNearDupPairsBanded(df, "vec_id", "embedding",
        0.5, bands = 7, planesPerBand = 7)
    }
  }
}
