package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("binned range join == naive inequality join, several bin widths") {
    val rnd = new scala.util.Random(17)
    val left = (0 until 300).map(i =>
      ("K" + rnd.nextInt(3), rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lv")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      ("K" + rnd.nextInt(3), s, s + 1 + rnd.nextInt(40), i.toLong)
    }.toDF("k", "s", "e", "rv")
    val naive = left.join(right, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("k", "t", "lv", "s", "e", "rv")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    for (w <- Seq(1L, 7L, 16L, 64L, 1000L)) {
      val binned = RangeJoin.joinPointInInterval(
          left, right, "t", "s", "e", Seq("k"), binWidth = w)
        .select("k", "t", "lv", "s", "e", "rv")
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      assert(binned == naive, s"binWidth=$w")
    }
  }

  test("range join: boundary semantics (half-open), empty/invalid intervals") {
    val left = Seq(("A", 10L), ("A", 14L), ("A", 15L)).toDF("k", "t")
    val right = Seq(
      ("A", 10L, 15L, "ok"),     // [10,15): matches t=10,14 not 15
      ("A", 20L, 20L, "empty"),  // empty interval: no matches
      ("A", 30L, 25L, "invalid") // end < start: filtered
    ).toDF("k", "s", "e", "tag")
    val out = RangeJoin.joinPointInInterval(left, right, "t", "s", "e", Seq("k"), 4L)
      .select("t", "tag").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((10L, "ok"), (14L, "ok")))
  }

  test("range join: sentinel/open-ended intervals take the fallback path") {
    // end = Long.MaxValue "still valid" sentinel — binning this would be
    // a ~2^53-element sequence() error; the fan-out cap routes it (and a
    // merely-long interval) through the keys-equi fallback instead.
    val left = Seq(("A", 10L), ("A", 500000L), ("B", 7L)).toDF("k", "t")
    val right = Seq(
      ("A", 5L, Long.MaxValue, "open"),    // matches both A rows
      ("A", 400L, 900000L, "long"),        // spans >> maxFanOut bins: matches t=500000
      ("A", 8L, 12L, "short"),             // binned path: matches t=10
      ("A", Long.MinValue, 12L, "sinceEver"), // sentinel START: matches t=10
      ("B", 100L, Long.MaxValue, "openB")  // open but starts after t=7: no match
    ).toDF("k", "s", "e", "tag")
    val out = RangeJoin.joinPointInInterval(left, right, "t", "s", "e",
        Seq("k"), binWidth = 3L, maxFanOut = 64L) // width 3: MinValue is NOT a bin multiple
      .select("t", "tag").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((10L, "open"), (10L, "short"), (10L, "sinceEver"),
      (500000L, "long"), (500000L, "open")))
    // equivalence with the naive join on a mixed corpus incl. sentinels
    val rnd = new scala.util.Random(5)
    val l2 = (0 until 200).map(i => ("K" + rnd.nextInt(3), rnd.nextInt(1000).toLong))
      .toDF("k", "t")
    val r2 = (0 until 80).map { i =>
      val s = rnd.nextInt(1000).toLong
      val e = if (i % 10 == 0) Long.MaxValue else s + 1 + rnd.nextInt(200)
      ("K" + rnd.nextInt(3), s, e, i.toLong)
    }.toDF("k", "s", "e", "rv")
    val naive = l2.join(r2, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("k", "t", "s", "e", "rv")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    val binned = RangeJoin.joinPointInInterval(l2, r2, "t", "s", "e",
        Seq("k"), binWidth = 16L, maxFanOut = 8L)
      .select("k", "t", "s", "e", "rv")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(binned == naive)
  }

  test("sessionization splits on gaps and rolls up correctly") {
    val df = Seq(
      ("u1", 1L), ("u1", 5L), ("u1", 9L),      // session 1: 1..9
      ("u1", 60L), ("u1", 61L),                // session 60 (gap 51)
      ("u2", 5L))                              // own key
      .toDF("user", "t")
    val stats = Sessionize.sessionStats(df, "t", Seq("user"), maxGap = 40L)
      .orderBy("user", "session_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stats == Seq(
      ("u1", 1L, 3L, 8L), ("u1", 60L, 2L, 1L), ("u2", 5L, 1L, 0L)))
    // row-level ids: every row carries its session's start
    val ids = Sessionize.withSessionIds(df, "t", Seq("user"), 40L)
      .filter(col("user") === "u1").select("t", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(ids == Seq((1L, 1L), (5L, 1L), (9L, 1L), (60L, 60L), (61L, 60L)))
  }
}
