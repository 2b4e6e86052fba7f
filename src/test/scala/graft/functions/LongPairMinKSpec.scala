package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded pair-heap aggregate behind BM25 top-K: k smallest
  * (a, b) pairs lexicographically, against a brute-force sort, across
  * partial/merge boundaries, nulls, duplicates, and negative keys (the
  * −score encoding is the production caller). */
class LongPairMinKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic pseudo-random pairs — seeded, so failures replay. */
  private def pairs(n: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => (r.nextLong() % 1000, r.nextLong() % 50))
  }

  private def brute(ps: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    ps.sorted.take(k)

  test("agrees with brute force across group sizes, k values, and " +
    "partition counts (the merge path runs)") {
    for (seed <- 1L to 3L; k <- Seq(1, 7, 64); n <- Seq(0, 5, 300)) {
      val ps = pairs(n, seed)
      val df = ps.toDF("a", "b").repartition(7)
      val got = df.agg(LongPairMinK.minK(col("a"), col("b"), k)
        .as("p")).collect()(0)
      val want = brute(ps, k)
      if (n == 0) assert(got.isNullAt(0), "empty group must yield null")
      else {
        val rows = got.getSeq[org.apache.spark.sql.Row](0)
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(rows == want, s"seed=$seed k=$k n=$n")
      }
    }
  }

  test("grouped: each group keeps its own k smallest; duplicates " +
    "occupy slots; ties on a break by b") {
    val data = Seq(
      (1L, 5L, 10L), (1L, 5L, 3L), (1L, 5L, 3L), (1L, 2L, 99L),
      (2L, -7L, 1L), (2L, -7L, 0L), (2L, 0L, 0L))
    val got = data.toDF("g", "a", "b").repartition(3)
      .groupBy("g")
      .agg(LongPairMinK.minK(col("a"), col("b"), 3).as("p"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(got(1L) == Seq((2L, 99L), (5L, 3L), (5L, 3L)))
    assert(got(2L) == Seq((-7L, 0L), (-7L, 1L), (0L, 0L)))
  }

  test("rows with a null component are skipped; all-null group is null") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (null, 1L), (1L, null), (2L, 2L)).toDF("a", "b")
    val got = df.agg(LongPairMinK.minK(col("a"), col("b"), 5).as("p"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((2L, 2L)))
    val allNull = Seq[(java.lang.Long, java.lang.Long)]((null, null))
      .toDF("a", "b")
      .agg(LongPairMinK.minK(col("a"), col("b"), 5)).collect()(0)
    assert(allNull.isNullAt(0))
  }

  test("k bounds validated loudly") {
    val e = intercept[IllegalArgumentException] {
      Seq((1L, 1L)).toDF("a", "b")
        .agg(LongPairMinK.minK(col("a"), col("b"), 0)).collect()
    }
    assert(e.getMessage.contains("long_pair_min_k"))
  }
}
