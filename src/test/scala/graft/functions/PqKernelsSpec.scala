package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd PQ kernels must be bit-identical to the composable
  * forms they replaced: exact-integer L2 argmin with ties to the LOWER
  * code (the lexicographic array_min-over-(dist, code) ordering), and
  * the ADC table-lookup dot. */
class PqKernelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2 subspaces x 3 codes x 2 dims, deterministic values
  private val cbs: Seq[Seq[(Int, Seq[Long], Long)]] = Seq(
    Seq((0, Seq(0L, 0L), 0L), (1, Seq(10L, 0L), 100L), (2, Seq(0L, 10L), 100L)),
    Seq((0, Seq(5L, 5L), 50L), (1, Seq(-5L, 5L), 50L), (2, Seq(7L, -1L), 50L)))

  private def bruteEncode(v: Seq[Long]): (Seq[Int], Long) = {
    val picks = cbs.zipWithIndex.map { case (cb, m) =>
      val sub = v.slice(m * 2, m * 2 + 2)
      cb.map { case (c, cw, n2) =>
        val dist = sub.zip(cw).map { case (x, y) => (x - y) * (x - y) }.sum
        (dist, c, n2)
      }.min // lexicographic: dist, then code
    }
    (picks.map(_._2), picks.map(_._3).sum)
  }

  test("pq_encode == composable argmin semantics, incl. tie to lower code") {
    // (6,1) is closer to code 2 of subspace 1... plus an exact TIE case:
    // (5,0) is equidistant (25+0=25... ) craft one: v2 sub (5,5) vs codes
    // 0:(5,5)d=0 — trivial. Tie: sub (2,5): c0 d=9, c1 d=49, c2 d=61.
    // Construct a genuine tie: sub (0,5) -> c0: 25, c1: 25 -> lower code 0.
    val vecs = Seq(
      (1L, Seq(6L, 1L, 2L, 5L)),
      (2L, Seq(0L, 5L, 0L, 5L)), // subspace 2 sub=(0,5): c0 d=25, c1 d=25 tie
      (3L, Seq(-3L, 9L, 7L, -1L)),
      (4L, Seq(0L, 0L, 5L, 5L)))
    val df = vecs.toDF("id", "v")
      .select(col("id"), PqKernels.pqEncode(col("v"), cbs).as("enc"))
      .select(col("id"), col("enc.codes"), col("enc.rec_n2"))
    df.collect().foreach { r =>
      val v = vecs.find(_._1 == r.getLong(0)).get._2
      val (codes, n2) = bruteEncode(v)
      assert(r.getSeq[Int](1) == codes, s"id=${r.getLong(0)}")
      assert(r.getLong(2) == n2, s"id=${r.getLong(0)}")
    }
    // the tie case really is a tie and really picks the lower code
    val sub = Seq(0L, 5L)
    val d0 = sub.zip(Seq(5L, 5L)).map { case (x, y) => (x - y) * (x - y) }.sum
    val d1 = sub.zip(Seq(-5L, 5L)).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d0 == d1)
    assert(bruteEncode(Seq(0L, 5L, 0L, 5L))._1(1) == 0)
  }

  test("adc_dot == manual table lookups") {
    val rows = Seq(
      (Seq(0, 2), Seq(Seq(1L, 2L, 3L), Seq(10L, 20L, 30L))),
      (Seq(1, 1), Seq(Seq(-5L, 7L, 0L), Seq(100L, -2L, 4L))))
    val got = rows.toDF("codes", "dt")
      .select(PqKernels.adcDotCol(col("codes"), col("dt")).as("d"))
      .as[Long].collect().toSeq
    val want = rows.map { case (codes, dt) =>
      codes.zipWithIndex.map { case (c, m) => dt(m)(c) }.sum }
    assert(got == want)
  }

  test("dimension mismatch fails loudly") {
    val e = intercept[Exception] {
      Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "v")
        .select(PqKernels.pqEncode(col("v"), cbs))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pq_encode")), msgs(e).mkString(" | "))
  }

  test("flatten rejects malformed codebooks") {
    intercept[IllegalArgumentException] {
      PqKernels.flatten(Seq(Seq((0, Seq(1L), 1L), (2, Seq(1L), 1L)))) // gap
    }
    intercept[IllegalArgumentException] {
      PqKernels.flatten(Seq(Seq((0, Seq(1L), 1L), (1, Seq(1L, 2L), 5L)))) // ragged
    }
  }
}
