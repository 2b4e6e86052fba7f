package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MineTripletsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "vec")
      .withColumn("vec", transform(col("vec"), x => x.cast("float")))

  // one centroid -> every vector shares the cell; negatives are then
  // purely threshold-gated, which makes the fixture hand-checkable
  private val oneCell = Seq((0L, Seq(1000L, 0L, 0L))).toDF("cent_id", "cent_v")

  test("triplet: top positive + hardest same-cell negative, hand-checked") {
    val df = vecsDf(Seq(
      1L -> Seq(1.0, 0.0, 0.0),     // anchor
      2L -> Seq(0.998, 0.06, 0.0),  // positive (cos ~0.9982)
      3L -> Seq(0.4, 0.917, 0.0),   // negative candidate, cos 0.4 vs anchor
      4L -> Seq(0.0, 1.0, 0.0),     // negative candidate, cos 0.0
      5L -> Seq(0.6, 0.8, 0.0)))    // cos 0.6 — above negThreshold, excluded
    val out = SimilarityOps.mineTriplets(df, "id", "vec", oneCell,
      posThreshold = 0.9, negThreshold = 0.5)
      .orderBy("anchor_id").collect()
    // TWO anchors: 1 (positive 2) and 3 (positive 5 — cos(3,5) ~0.973)
    assert(out.length == 2, out.mkString(";"))
    val r1 = out(0)
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 2L)
    assert(math.abs(r1.getDouble(2) - 0.9982) < 1e-3)
    assert(r1.getLong(3) == 3L, "hardest negative = highest cosine below the cap")
    assert(math.abs(r1.getDouble(4) - 0.4) < 1e-3)
    val r2 = out(1)
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 5L)
    // anchor 3's candidates below 0.5: doc 2 (cos ~0.454) beats doc 1 (0.4)
    assert(r2.getLong(3) == 2L)
    assert(math.abs(r2.getDouble(4) - 0.454) < 1e-3)
  }

  test("anchors without a qualifying negative are dropped") {
    val df = vecsDf(Seq(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.998, 0.06, 0.0)))
    val out = SimilarityOps.mineTriplets(df, "id", "vec", oneCell,
      posThreshold = 0.9, negThreshold = 0.5).collect()
    assert(out.isEmpty)
  }

  test("negThreshold above posThreshold is refused") {
    val df = vecsDf(Seq(1L -> Seq(1.0, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      SimilarityOps.mineTriplets(df, "id", "vec", oneCell, 0.5, 0.9)
    }
  }
}
