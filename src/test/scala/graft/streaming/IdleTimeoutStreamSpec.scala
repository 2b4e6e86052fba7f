package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Post-timeout behavior of the stateful book streams, pinned
  * explicitly (the documented eviction trade, not an accident):
  *
  *  - analyticsSummaryStream: eviction emits a FINAL superseding
  *    summary row (the accumulated analytics survive), and a
  *    re-appearing product starts fresh counters and a fresh emit
  *    sequence;
  *  - ofiFromPriceUpdates: eviction silently discards cum_ofi — the
  *    re-appearing product restarts from 0 (the scaladoc'd trade);
  *  - replay streams: the re-appearing product replays on a FRESH
  *    book.
  *
  * Each test drives a real micro-batch sequence: batch 1 builds
  * product 1's state, a sleep ages it past a 1 ms ProcessingTime
  * timeout, batch 2 (other-product traffic) fires the eviction, and
  * batch 3 re-appears product 1. */
class IdleTimeoutStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val p1Batch1: Seq[(Long, Long, Long, Long, Boolean)] = Seq(
    (1L, 0L, 10L, 5L, true), (1L, 1L, 20L, 7L, false),
    (1L, 2L, 11L, 4L, true))
  private val p2Batch2: Seq[(Long, Long, Long, Long, Boolean)] = Seq(
    (2L, 10L, 30L, 2L, true))
  private val p1Batch3: Seq[(Long, Long, Long, Long, Boolean)] = Seq(
    (1L, 20L, 12L, 6L, true), (1L, 21L, 22L, 3L, false))

  /** Under ProcessingTimeTimeout the engine schedules batches
    * continually to fire pending timeouts, so `processAllAvailable`
    * never reports caught-up — the sink is POLLED for an expected
    * predicate instead, with a loud deadline. */
  private def awaitSink(label: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) Thread.sleep(100)
    assert(pred, s"timed out waiting for: $label")
  }

  /** Three checkpoints: product 1 builds state, ages past the timeout,
    * and the OTHER-product batch fires its eviction BEFORE product 1
    * re-appears — each stage awaited so the engine cannot coalesce the
    * eviction batch with the re-appearance batch. */
  private def drive(out: org.apache.spark.sql.DataFrame, name: String,
                    afterB1: String, b1Done: => Boolean,
                    afterB2: String, b2Done: => Boolean,
                    afterB3: String, b3Done: => Boolean)(
      mem: MemoryStream[(Long, Long, Long, Long, Boolean)]): Unit = {
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(p1Batch1)
      awaitSink(afterB1)(b1Done)
      Thread.sleep(400) // age product 1's state past the 1 ms timeout
      mem.addData(p2Batch2)
      awaitSink(afterB2)(b2Done)
      mem.addData(p1Batch3)
      awaitSink(afterB3)(b3Done)
    } finally query.stop()
  }

  test("summary stream: eviction emits a final superseding row; " +
    "re-appearance restarts counters and emit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    def sink = spark.table("summary_timeout")
      .select("product", "emit", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    drive(OrderBookStream.analyticsSummaryStream(
        mem.toDF.toDF("product", "seq", "price", "qty", "is_bid"),
        "price", "qty", "is_bid", "product", "seq",
        idleTimeout = Some("1 millisecond")), "summary_timeout",
      "batch-1 summary row", sink.exists(r => r._1 == 1L && r._3 == 3L),
      "eviction tombstone", sink.exists(r => r._1 == 1L && r._2 == 1L),
      "re-appearance row", sink.exists(r => r._1 == 1L && r._3 == 2L))(mem)

    val rows = sink
    val p1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // batch-1 row (emit 0, 3 events), the eviction tombstone (emit 1,
    // SAME totals), then the fresh incarnation's batch-3 row (emit 0
    // again, 2 events)
    assert(p1.count(r => r._2 == 0L && r._3 == 3L) == 1, s"$p1")
    assert(p1.count(r => r._2 == 1L && r._3 == 3L) == 1,
      s"eviction must emit a final row with the accumulated totals: $p1")
    assert(p1.count(r => r._2 == 0L && r._3 == 2L) == 1,
      s"re-appearance must restart counters and emit: $p1")
  }

  test("ofi stream: eviction discards cum_ofi — the re-appearing " +
    "product restarts from zero") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    def sink = spark.table("ofi_timeout")
      .select("product", "seq", "cum_ofi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    drive(OrderBookStream.ofiFromPriceUpdates(
        mem.toDF.toDF("product", "seq", "price", "qty", "is_bid"),
        "price", "qty", "is_bid", "product", "seq",
        idleTimeout = Some("1 millisecond")), "ofi_timeout",
      "batch-1 rows", sink.count(_._1 == 1L) == 3,
      "batch-2 row", sink.exists(_._2 == 10L),
      "batch-3 rows", sink.exists(_._2 == 21L))(mem)

    val rows = sink
    // batch 1 ends with a nonzero running sum for product 1…
    val before = rows.filter(r => r._1 == 1L && r._2 <= 2L).maxBy(_._2)._3
    assert(before != 0L, "fixture must accumulate a nonzero cum_ofi")
    // …and batch 3's first row starts a FRESH chain: a fresh book's
    // first events have no previous quote, so ofi = cum_ofi = 0
    val after = rows.filter(r => r._1 == 1L && r._2 >= 20L).sortBy(_._2)
    assert(after.nonEmpty && after.head._3 == 0L,
      s"cum_ofi must restart from 0 after eviction, got $after")
  }

  test("replay stream: the re-appearing product folds on a fresh book") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Boolean)]
    def sink = spark.table("replay_timeout")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    drive(OrderBookStream.topNLevelsFromPriceUpdates(
        mem.toDF.toDF("product", "seq", "price", "qty", "is_bid"),
        "price", "qty", "is_bid", 1, "product", "seq",
        idleTimeout = Some("1 millisecond")), "replay_timeout",
      "batch-1 rows", sink.count(_._1 == 1L) == 3,
      "batch-2 row", sink.exists(_._2 == 10L),
      "batch-3 rows", sink.exists(_._2 == 21L))(mem)

    val rows = sink
    // seq 20 is a bid at 12 on what must be an EMPTY book: bid_px_1 is
    // 12, not batch 1's best bid 11 carried over
    val reappear = rows.find(r => r._1 == 1L && r._2 == 20L).get
    assert(reappear._3.contains(12L),
      s"fresh book expected after eviction, got $reappear")
  }
}
