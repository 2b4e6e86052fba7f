package graft.plans

import graft.SparkTestSession
import graft.operators.OrderBookOps
import graft.queries.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence: the window-function (TypedImperativeAggregate) form must
  * produce exactly the flatMapSortedGroups form's output — SURVEY.md §7.2
  * step 4. */
class BboWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flatten(n: Int) =
    OrderBookOps.bboFieldNames(n).map(f => col(s"bbo.$f").as(f))

  test("window form == flatMapGroups form on derived events (updates, n=2)") {
    val stream = EventStreams.bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    val viaGroups = OrderBookOps.topNLevelsFromPriceUpdates(
        stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
      .select(col("product") +: col("seq") +: OrderBookOps.bboFieldNames(2).map(col): _*)
    val viaWindow = stream.withColumn("bbo",
        BboWindow.fromPriceUpdates(col("price"), col("qty"), col("is_bid"), 2,
          Seq(col("product")), Seq(col("seq"))))
      .select(col("product") +: col("seq") +: flatten(2): _*)
    val a = viaGroups.orderBy("product", "seq").collect()
    val b = viaWindow.orderBy("product", "seq").collect()
    assert(a.length == b.length && a.length == 1000)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("window form == flatMapGroups form (mutations, n=1)") {
    val stream = EventStreams.bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = false)
    val viaGroups = OrderBookOps.topNLevelsFromPriceMutations(
        stream, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      .select(col("product") +: col("seq") +: OrderBookOps.bboFieldNames(1).map(col): _*)
    val viaWindow = stream.withColumn("bbo",
        BboWindow.fromPriceMutations(col("price"), col("qty"), col("is_bid"), 1,
          Seq(col("product")), Seq(col("seq"))))
      .select(col("product") +: col("seq") +: flatten(1): _*)
    assert(viaGroups.orderBy("product", "seq").collect().toSeq ==
      viaWindow.orderBy("product", "seq").collect().toSeq)
  }

  test("window form modify golden (cyclic fixture)") {
    val rows = Seq(
      (0, 1L, 1L, true, None, None),
      (1, 6L, 6L, false, None, None),
      (2, 2L, 2L, true, Some(1L), Some(1L)),
      (3, 3L, 3L, true, Some(2L), Some(2L)),
      (4, 1L, 1L, true, Some(3L), Some(3L)),
      (5, 5L, 5L, false, Some(6L), Some(6L)),
      (6, 4L, 4L, false, Some(5L), Some(5L)),
      (7, 6L, 6L, false, Some(4L), Some(4L)))
    val df = rows.toDF("seq", "price", "qty", "is_bid", "prev_price", "prev_qty")
    val out = df.withColumn("bbo",
        BboWindow.fromPriceMutationsWithModify(col("price"), col("qty"), col("is_bid"),
          col("prev_price"), col("prev_qty"), 1, Nil, Seq(col("seq"))))
      .select(col("seq"), col("bbo.bid_price_1"), col("bbo.ask_price_1"))
      .orderBy("seq").collect()
    val expBid = Seq(1L, 1, 2, 3, 1, 1, 1, 1)
    val expAsk = Seq(None, Some(6L), Some(6L), Some(6L), Some(6L), Some(5L), Some(4L), Some(6L))
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == expBid(i), s"row $i bid")
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == expAsk(i), s"row $i ask")
    }
  }

  test("using the aggregate without a window frame fails (no merge)") {
    val df = Seq((1L, 1L, true)).toDF("price", "qty", "is_bid")
    val c = org.apache.spark.sql.GraftColumnBridge.column(
      BboWindowAggregate(0, 1, Seq(
        org.apache.spark.sql.GraftColumnBridge.expression(col("price")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("qty")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("is_bid"))))
        .toAggregateExpression())
    val e = intercept[Exception] { df.agg(c).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("associative"))))
  }

  test("codec round-trips book state") {
    import graft.core._
    val book = new OrderBook(3)
    Seq((true, 5L, 10L), (true, 4L, 7L), (true, 6L, 1L), (false, 9L, 2L))
      .foreach { case (b, p, q) => book.addQty(b, p, q) }
    val back = BookCodec.deserialize(BookCodec.serialize(book))
    val a = new Array[Any](12); val c = new Array[Any](12)
    book.snapshotInto(a, 0); back.snapshotInto(c, 0)
    assert(a.toSeq == c.toSeq)
    // state continues correctly after round-trip
    back.deleteQty(isBid = true, 6L, 1L)
    book.deleteQty(isBid = true, 6L, 1L)
    val a2 = new Array[Any](12); val c2 = new Array[Any](12)
    book.snapshotInto(a2, 0); back.snapshotInto(c2, 0)
    assert(a2.toSeq == c2.toSeq)
  }
}
