package graft.streaming

import graft.SparkTestSession
import graft.operators.{BookAnalytics, OrderBookOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twins for the book analytics: the one-pass replay+OFI fold
  * must match the batch replay piped through the batch window-form OFI,
  * across micro-batch boundaries (prev-quote scalar + running sum live
  * in the state store); microprice is stateless and applies to the
  * stream unchanged. */
class BookAnalyticsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two products; includes deletions (qty 0) so one-sided/NULL tops and
  // broken flow chains are exercised, and bid/ask improvements both ways
  private val events: Seq[(Long, Long, Long, Long, Boolean)] = {
    val price = Seq(10L, 12, 11, 20, 19, 21, 12, 10, 19, 11, 13, 18)
    val qty = Seq(5L, 7, 4, 6, 3, 8, 0, 2, 0, 0, 9, 1)
    val isBid = Seq(true, true, true, false, false, false,
      true, true, false, true, true, false)
    for (p <- Seq(1L, 2L); i <- 0 until 12)
      yield (p, i.toLong, price(i), qty(i), isBid(i))
  }

  private def batchOfi = {
    val bbo = OrderBookOps.topNLevelsFromPriceUpdates(
      events.toDF("product", "seq", "price", "qty", "is_bid"),
      "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
    BookAnalytics.orderFlowImbalance(bbo)
      .select("product", "seq", "ofi", "cum_ofi")
      .orderBy("product", "seq").collect().toSeq
  }

  test("stream OFI across three micro-batches == batch replay + window OFI") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val sdf = mem.toDF.toDF("product", "seq", "price", "qty", "is_bid")
    val out = OrderBookStream.ofiFromPriceUpdates(
      sdf, "price", "qty", "is_bid", partitionBy = "product", orderBy = "seq")
    val query = out.writeStream.format("memory").queryName("ofi_stream")
      .outputMode("append").start()
    try {
      val (b1, rest) = events.splitAt(9)
      val (b2, b3) = rest.splitAt(8)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      mem.addData(b3); query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("ofi_stream")
      .select("product", "seq", "ofi", "cum_ofi")
      .orderBy("product", "seq").collect().toSeq
    assert(streamed.length == 24)
    assert(streamed == batchOfi)
  }

  test("stream output carries the BBO frame; microprice applies unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val sdf = mem.toDF.toDF("product", "seq", "price", "qty", "is_bid")
    val out = OrderBookStream.ofiFromPriceUpdates(
      sdf, "price", "qty", "is_bid", partitionBy = "product", orderBy = "seq")
    // the stateless analytics map composes on the STREAMING frame — if
    // microprice ever grew a shuffle/window this would throw at
    // analysis time, which is the structural pin
    val mp = BookAnalytics.microprice(out)
    val query = mp.writeStream.format("memory").queryName("mp_stream")
      .outputMode("append").start()
    try {
      mem.addData(events); query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("mp_stream")
      .orderBy("product", "seq").collect().toSeq
    val batch = {
      val bbo = OrderBookOps.topNLevelsFromPriceUpdates(
        events.toDF("product", "seq", "price", "qty", "is_bid"),
        "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      BookAnalytics.microprice(bbo).orderBy("product", "seq").collect().toSeq
    }
    assert(streamed.length == 24)
    assert(streamed == batch)
  }

  test("running summary stream: max-emit rows == batch TWA spread + realized variance") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val sdf = mem.toDF.toDF("product", "seq", "price", "qty", "is_bid")
    val out = OrderBookStream.analyticsSummaryStream(
      sdf, "price", "qty", "is_bid", partitionBy = "product", orderBy = "seq")
    val query = out.writeStream.format("memory").queryName("summary_stream")
      .outputMode("append").start()
    try {
      val (b1, rest) = events.splitAt(7)
      val (b2, b3) = rest.splitAt(9)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      mem.addData(b3); query.processAllAvailable()
    } finally query.stop()

    // current values = the max-emit row per product (append-mode rows
    // supersede, they cannot be retracted)
    val latest = spark.table("summary_stream")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("product"))
          .orderBy(col("emit").desc)))
      .filter(col("__rk") === 1).drop("__rk", "emit")
      .orderBy("product").collect().map(_.toSeq).toSeq

    val bbo = OrderBookOps.topNLevelsFromPriceUpdates(
      events.toDF("product", "seq", "price", "qty", "is_bid"),
      "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
    val batch = BookAnalytics.timeWeightedSpread(bbo)
      .join(BookAnalytics.realizedVariance(bbo), "product")
      .select("product", "n_events", "n_quoted", "quoted_ticks",
        "twa_spread_permille", "n_quotes", "n_moves", "rv_x4")
      .orderBy("product").collect().map(_.toSeq).toSeq
    assert(latest == batch)
  }

  test("depth imbalance is stateless and applies to the replay stream unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val sdf = mem.toDF.toDF("product", "seq", "price", "qty", "is_bid")
    val stream = OrderBookStream.topNLevelsFromPriceUpdates(
      sdf, "price", "qty", "is_bid", n = 2, partitionBy = "product",
      orderBy = "seq")
    val di = BookAnalytics.depthImbalance(stream, n = 2)
    val query = di.writeStream.format("memory").queryName("depth_stream")
      .outputMode("append").start()
    try { mem.addData(events); query.processAllAvailable() }
    finally query.stop()
    val streamed = spark.table("depth_stream")
      .orderBy("product", "seq").collect().map(_.toSeq).toSeq
    val batch = BookAnalytics.depthImbalance(
        OrderBookOps.topNLevelsFromPriceUpdates(
          events.toDF("product", "seq", "price", "qty", "is_bid"),
          "price", "qty", "is_bid", 2, Seq("product"), Seq("seq")), n = 2)
      .orderBy("product", "seq").collect().map(_.toSeq).toSeq
    assert(streamed.length == 24 && streamed == batch)
  }

  test("cum_ofi survives a product going one-sided and back") {
    // single product: build both sides, delete the ask (one-sided),
    // re-quote — flows across the gap must be 0 on the broken side only
    val ev = Seq(
      (9L, 0L, 10L, 5L, true),
      (9L, 1L, 20L, 6L, false),
      (9L, 2L, 20L, 0L, false), // ask side empties
      (9L, 3L, 21L, 4L, false), // ask returns
      (9L, 4L, 11L, 2L, true))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    val sdf = mem.toDF.toDF("product", "seq", "price", "qty", "is_bid")
    val out = OrderBookStream.ofiFromPriceUpdates(
      sdf, "price", "qty", "is_bid", partitionBy = "product", orderBy = "seq")
    val query = out.writeStream.format("memory").queryName("ofi_gap_stream")
      .outputMode("append").start()
    try {
      ev.grouped(2).foreach { g => mem.addData(g); query.processAllAvailable() }
    } finally query.stop()
    val streamed = spark.table("ofi_gap_stream")
      .select("product", "seq", "ofi", "cum_ofi")
      .orderBy("seq").collect().toSeq
    val batch = {
      val bbo = OrderBookOps.topNLevelsFromPriceUpdates(
        ev.toDF("product", "seq", "price", "qty", "is_bid"),
        "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      BookAnalytics.orderFlowImbalance(bbo)
        .select("product", "seq", "ofi", "cum_ofi")
        .orderBy("seq").collect().toSeq
    }
    assert(streamed == batch)
  }
}
