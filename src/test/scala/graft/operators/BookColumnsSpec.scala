package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The README normalization recipe end-to-end (reference README.md:133-178):
  * raw messages → normalized mutation stream → replay → unscaled output. */
class BookColumnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("full recipe: normalize raw messages, replay, unscale prices") {
    val raw = Seq(
      // (seq, message_type, side, price(float), qty)
      (0, "add", "bid", 1.25, 10L),
      (1, "add", "ask", 1.50, 8L),
      (2, "add", "bid", 1.30, 5L),
      (3, "trade", "bid", 1.30, 2L), // trade -> negative qty
      (4, "delete", "ask", 1.50, 8L) // delete -> negative qty (removes level)
    ).toDF("seq", "message_type", "side", "price", "qty")

    val F = 100L
    val normalized = raw.select(
      col("seq"),
      BookColumns.isBidFromSide(col("side")),
      BookColumns.scalePrice(col("price"), F).as("price_scaled"),
      BookColumns.signedQty(col("message_type"), col("qty")).as("qty_signed"))

    val replayed = OrderBookOps.topNLevelsFromPriceMutations(
      normalized, "price_scaled", "qty_signed", "is_bid", 1, Nil, Seq("seq"))
    val out = BookColumns.unscaleLevelPrices(replayed, F)
      .orderBy("seq")
      .select("seq", "bid_price_1", "bid_qty_1", "ask_price_1", "ask_qty_1")
      .collect()

    // seq0: bid 1.25@10 | seq1: +ask 1.50@8 | seq2: bid best 1.30@5
    // seq3: trade 2 -> bid 1.30@3 | seq4: ask level removed
    assert(out(0).getDouble(1) == 1.25 && out(0).getLong(2) == 10L && out(0).isNullAt(3))
    assert(out(1).getDouble(3) == 1.50 && out(1).getLong(4) == 8L)
    assert(out(2).getDouble(1) == 1.30 && out(2).getLong(2) == 5L)
    assert(out(3).getDouble(1) == 1.30 && out(3).getLong(2) == 3L)
    assert(out(4).isNullAt(3) && out(4).getDouble(1) == 1.30)
  }

  test("reset epochs partition replays into fresh books (README.md:201-216)") {
    val raw = Seq(
      // (product, seq, is_reset, price, qty, is_bid)
      ("A", 0, false, 5L, 10L, true),
      ("A", 1, false, 6L, 20L, true),
      ("A", 2, true, 0L, 0L, true),  // reset marker: fresh book afterwards
      ("A", 3, false, 3L, 7L, true)
    ).toDF("product", "seq", "is_reset", "price", "qty", "is_bid")

    val withEpoch = BookColumns.resetEpoch(raw, "is_reset", Seq("product"), Seq("seq"))
    val out = OrderBookOps.topNLevelsFromPriceUpdates(
        withEpoch.filter(!col("is_reset")), "price", "qty", "is_bid", 1,
        Seq("product", "reset_count"), Seq("seq"))
      .orderBy("seq").select("seq", "bid_price_1", "bid_qty_1").collect()

    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 3))
    assert(out(1).getLong(1) == 6L)  // before reset: best 6
    assert(out(2).getLong(1) == 3L && out(2).getLong(2) == 7L) // fresh book
  }

  test("csv source round-trip feeds the replay (ninja.rs:26-38 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val events = Seq((0L, 100L, 5L, true), (1L, 101L, 3L, false), (2L, 100L, -5L, true))
      .toDF("seq", "price", "qty_diff", "is_bid")
    events.write.mode("overwrite").option("header", "true").csv(dir)

    val back = spark.read.option("header", "true")
      .schema("seq LONG, price LONG, qty_diff LONG, is_bid BOOLEAN")
      .csv(dir)
    val replayed = OrderBookOps.topNLevelsFromPriceMutations(
        back, "price", "qty_diff", "is_bid", 1, Nil, Seq("seq"))
      .orderBy("seq").select("seq", "bid_price_1", "ask_price_1").collect()
    assert(replayed.length == 3)
    assert(replayed(0).getLong(1) == 100L)
    assert(replayed(2).isNullAt(1) && replayed(2).getLong(2) == 101L)
  }
}
