package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd LshBucket kernel must be bit-identical to the
  * composable aggregate(zip_with(·, planeWeight)) form it replaced —
  * that form is also exactly what every LSH oracle unrolls in SQL. */
class LshBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def composableBucket(s: org.apache.spark.sql.Column,
                               planes: Int): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(s, sequence(lit(0), size(s) - 1),
          (x, j) => x * SimilarityOps.planeWeight(p, j)),
        lit(0L), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("kernel bucket == composable bucket on varied vectors and planes") {
    val vecs = (0L until 200L).map { i =>
      (i, (0 until 16).map(j => ((i * 31 + j * 17) % 4001) - 2000))
    }.toDF("id", "raw")
      .select(col("id"), transform(col("raw"), _.cast("long")).as("sv"))
    Seq(1, 6, 8, 12).foreach { planes =>
      val mismatch = vecs
        .select(
          graft.functions.LshBucket.bucket(col("sv"), planes).as("kernel"),
          composableBucket(col("sv"), planes).as("composable"))
        .filter(col("kernel") =!= col("composable"))
        .count()
      assert(mismatch == 0L, s"planes=$planes diverged")
    }
  }

  test("zero vector lands in bucket 0; null vector yields null") {
    val df = Seq((1L, Some(Seq(0L, 0L, 0L))), (2L, None))
      .toDF("id", "sv")
    val got = df.select(col("id"),
        graft.functions.LshBucket.bucket(col("sv"), 6).as("b"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(0L)) // no strictly-positive projection
    assert(got(2L).isEmpty)
  }
}
