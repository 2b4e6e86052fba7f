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

  test("negative pool cap bounds the candidate join and prunes map-side") {
    // 40 hot-cell members; with maxNegPool = 4 the negative must come
    // from the 4 pool members (smallest id-hash rank), even when a
    // harder negative exists outside the pool
    val hot = (10L until 50L).map(i =>
      i -> Seq(0.3 + (i % 7) * 0.1, 1.0, (i % 3) * 0.2))
    val df = vecsDf(Seq(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.998, 0.06, 0.0)) ++ hot)
    val capped = SimilarityOps.mineTriplets(df, "id", "vec", oneCell,
      posThreshold = 0.9, negThreshold = 0.5, maxNegPool = 4)
    // structural pin: the rank<=k filter must rewrite to
    // WindowGroupLimit so the hot cell is pruned BEFORE the exchange
    val wgl = capped.queryExecution.executedPlan.toString
    assert(wgl.contains("WindowGroupLimit"),
      "pool cap did not lower to WindowGroupLimit")
    val out = capped.collect()
    // the anchor still mines a triplet, and its negative is a pool member
    val poolIds = df.select(col("id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          graft.functions.StringPolyHash.polyHash(col("id").cast("string")),
          col("id"))))
      .filter(col("rk") <= 4).collect().map(_.getLong(0)).toSet
    out.filter(_.getLong(0) == 1L).foreach { r =>
      assert(poolIds.contains(r.getLong(3)),
        s"negative ${r.getLong(3)} not in the capped pool $poolIds")
    }
    // uncapped run may pick a different (harder) negative — the trade
    val full = SimilarityOps.mineTriplets(df, "id", "vec", oneCell,
      posThreshold = 0.9, negThreshold = 0.5, maxNegPool = 1000)
      .collect()
    assert(full.nonEmpty && out.nonEmpty)
  }

  test("negThreshold above posThreshold is refused") {
    val df = vecsDf(Seq(1L -> Seq(1.0, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      SimilarityOps.mineTriplets(df, "id", "vec", oneCell, 0.5, 0.9)
    }
  }
}
