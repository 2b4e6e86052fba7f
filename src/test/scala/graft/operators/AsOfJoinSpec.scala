package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 100L), ("A", 20L, 110L), ("A", 40L, 120L),
    ("B", 15L, 500L))
    .toDF("sym", "t", "px")

  private val trades = Seq(
    ("A", 5L, 1L),   // before any quote -> no match
    ("A", 10L, 2L),  // equal time -> matches the 10 quote (backward incl. ties)
    ("A", 25L, 3L),  // between -> 20 quote
    ("A", 99L, 4L),  // after last -> 40 quote
    ("B", 16L, 5L),  // B's only quote
    ("C", 50L, 6L))  // no quotes for C
    .toDF("sym", "t", "qty")

  test("backward as-of join picks the latest quote at or before each trade") {
    val out = AsOfJoin.joinAsOfBackward(trades, quotes, "t", Seq("sym"), Seq("px"))
      .orderBy("sym", "t").collect()
    def px(i: Int): Option[Long] = if (out(i).isNullAt(3)) None else Some(out(i).getLong(3))
    def at(i: Int): Option[Long] = if (out(i).isNullAt(4)) None else Some(out(i).getLong(4))
    assert(px(0).isEmpty && at(0).isEmpty)              // A@5
    assert(px(1) == Some(100L) && at(1) == Some(10L))   // A@10 tie
    assert(px(2) == Some(110L) && at(2) == Some(20L))   // A@25
    assert(px(3) == Some(120L) && at(3) == Some(40L))   // A@99
    assert(px(4) == Some(500L))                         // B@16
    assert(px(5).isEmpty)                               // C@50
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.joinAsOfBackward(trades, quotes, "t", Seq("sym"), Seq("px"),
        tolerance = Some(10L))
      .orderBy("sym", "t").collect()
    def px(i: Int): Option[Long] = if (out(i).isNullAt(3)) None else Some(out(i).getLong(3))
    assert(px(1) == Some(100L)) // A@10, age 0 <= 10
    assert(px(2) == Some(110L)) // A@25, age 5 <= 10
    assert(px(3).isEmpty)       // A@99, age 59 > 10 -> stale
  }

  test("left row count is preserved and left columns untouched") {
    val out = AsOfJoin.joinAsOfBackward(trades, quotes, "t", Seq("sym"), Seq("px"))
    assert(out.count() == 6)
    assert(out.columns.toSeq == Seq("sym", "t", "qty", "px", "asof_t"))
    assert(out.agg(sum("qty")).collect()(0).getLong(0) == 21L)
  }

  test("forward as-of picks the earliest quote at or after each trade") {
    val out = AsOfJoin.joinAsOfForward(trades, quotes, "t", Seq("sym"), Seq("px"))
      .orderBy("sym", "t").collect()
    def px(i: Int): Option[Long] = if (out(i).isNullAt(3)) None else Some(out(i).getLong(3))
    def at(i: Int): Option[Long] = if (out(i).isNullAt(4)) None else Some(out(i).getLong(4))
    assert(px(0) == Some(100L) && at(0) == Some(10L)) // A@5 -> next quote 10
    assert(px(1) == Some(100L) && at(1) == Some(10L)) // A@10 tie -> same-time quote
    assert(px(2) == Some(120L) && at(2) == Some(40L)) // A@25 -> 40
    assert(px(3).isEmpty)                             // A@99 -> none after
    assert(px(4).isEmpty)                             // B@16 -> B quote was at 15
    assert(px(5).isEmpty)                             // C -> no quotes
  }

  test("nearest as-of picks the closer quote, ties backward") {
    // quotes A: 10, 20, 40. B: 15. C: none
    val out = AsOfJoin.joinAsOfNearest(trades, quotes, "t", Seq("sym"), Seq("px"))
      .orderBy("sym", "t").collect()
    def px(i: Int): Option[Long] = if (out(i).isNullAt(3)) None else Some(out(i).getLong(3))
    def at(i: Int): Option[Long] = if (out(i).isNullAt(4)) None else Some(out(i).getLong(4))
    assert(px(0) == Some(100L) && at(0) == Some(10L)) // A@5  -> 10 (only fwd)
    assert(px(1) == Some(100L) && at(1) == Some(10L)) // A@10 -> exact
    assert(px(2) == Some(110L) && at(2) == Some(20L)) // A@25 -> 20 (5) vs 40 (15)
    assert(px(3) == Some(120L) && at(3) == Some(40L)) // A@99 -> 40 (only back)
    assert(px(4) == Some(500L) && at(4) == Some(15L)) // B@16 -> 15
    assert(px(5).isEmpty)                             // C -> none
    // exact tie (30 is equidistant from 20 and 40) -> backward wins
    val tie = Seq(("A", 30L, 9L)).toDF("sym", "t", "qty")
    val r = AsOfJoin.joinAsOfNearest(tie, quotes, "t", Seq("sym"), Seq("px")).collect()(0)
    assert(r.getLong(4) == 20L && r.getLong(3) == 110L)
    // tolerance bounds the absolute distance
    val tol = AsOfJoin.joinAsOfNearest(trades, quotes, "t", Seq("sym"), Seq("px"),
        tolerance = Some(4L))
      .orderBy("sym", "t").collect()
    assert(tol(0).isNullAt(3))  // A@5 -> nearest 10 at distance 5 > 4
    assert(!tol(1).isNullAt(3)) // A@10 -> exact match, distance 0
    assert(tol(2).isNullAt(3))  // A@25 -> nearest 20 at distance 5 > 4
  }

  test("nearest tolerance gates candidates, not the picked winner (merge_asof)") {
    // quotes A: 10, 20, 40. Trade A@35: backward 20 (distance 15, OUT of
    // tol 10), forward 40 (distance 5, in tol) -> must match 40. An
    // implementation that first dropped the stale BACKWARD and gave up
    // (tolerance as a backward-staleness check) would return null here.
    // Note |backDist| >= |fwdDist| implies the truly adversarial case
    // (nearer out of tolerance, farther in) cannot exist: the farther
    // candidate's distance is >= the nearer's, so gating candidates
    // before the pick and nulling the picked winner coincide — the
    // candidate-gated form is kept because it states the merge_asof
    // convention directly.
    val t = Seq(("A", 35L, 1L)).toDF("sym", "t", "qty")
    val r = AsOfJoin.joinAsOfNearest(t, quotes, "t", Seq("sym"), Seq("px"),
      tolerance = Some(10L)).collect()(0)
    assert(r.getLong(4) == 40L && r.getLong(3) == 120L)
    // symmetric check: forward out, backward in
    val t2 = Seq(("A", 24L, 1L)).toDF("sym", "t", "qty")
    val r2 = AsOfJoin.joinAsOfNearest(t2, quotes, "t", Seq("sym"), Seq("px"),
      tolerance = Some(10L)).collect()(0)
    assert(r2.getLong(4) == 20L && r2.getLong(3) == 110L)
    // both out of tolerance -> null
    val t3 = Seq(("A", 30L, 1L)).toDF("sym", "t", "qty")
    val r3 = AsOfJoin.joinAsOfNearest(t3, quotes, "t", Seq("sym"), Seq("px"),
      tolerance = Some(5L)).collect()(0)
    assert(r3.isNullAt(3) && r3.isNullAt(4))
  }

  test("a null left time matches nothing in either direction") {
    // DuckDB ASOF (and SQL comparison semantics) never match a NULL time;
    // the forward direction used to inherit the earliest quote because
    // desc ordering defaults to nulls-LAST.
    val nullTrades = Seq(
      ("A", Some(25L), 1L),
      ("A", None, 2L))
      .toDF("sym", "t", "qty")
    for (forward <- Seq(false, true)) {
      val out = (if (forward)
        AsOfJoin.joinAsOfForward(nullTrades, quotes, "t", Seq("sym"), Seq("px"))
      else
        AsOfJoin.joinAsOfBackward(nullTrades, quotes, "t", Seq("sym"), Seq("px")))
        .orderBy(col("t").asc_nulls_last).collect()
      assert(out.length == 2)
      assert(!out(0).isNullAt(3), s"forward=$forward: non-null time must match")
      assert(out(1).isNullAt(3) && out(1).isNullAt(4),
        s"forward=$forward: null-time left row must not match any quote")
    }
  }
}
