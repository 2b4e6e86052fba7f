package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EVENT-time idle eviction — the faster-than-realtime twin of the
  * processing-time timeout: all three stateful book streams replay a
  * one-hour event timeline in under a minute of wall clock with a
  * TEN-MINUTE idle timeout, and the idle product still evicts — which
  * can only happen if eviction is keyed to the stream's watermark, not
  * the wall clock (a processing-time timeout of 10 minutes could not
  * fire inside this test's deadline). Post-eviction semantics must be
  * IDENTICAL to the processing-time mode pinned in
  * IdleTimeoutStreamSpec: fresh book on re-appearance, a final
  * superseding summary row with the accumulated totals at eviction. */
class EventTimeIdleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1767265200000L + minutes * 60000L) // 2026-01-01T11:00Z

  type Ev = (Long, Long, Long, Long, Boolean, java.sql.Timestamp)
  // product 1 trades at minute 0, product 2 an hour later: under a
  // 10-minute EVENT-time idle timeout the watermark reaching minute 60
  // evicts product 1 at minute ~10 of stream time
  private val p1Batch1: Seq[Ev] = Seq(
    (1L, 0L, 10L, 5L, true, ts(0)), (1L, 1L, 20L, 7L, false, ts(0)),
    (1L, 2L, 11L, 4L, true, ts(1)))
  private val p2Batch2: Seq[Ev] = Seq((2L, 10L, 30L, 2L, true, ts(60)))
  // the eviction TRIGGER batch: by the time this processes, the
  // watermark (updated after batch 2) is already past product 1's
  // timeout, so the timed-out state fires DURING this batch — no
  // reliance on the engine scheduling a no-data micro-batch between
  // our addData calls (a real race under suite load for the streams
  // whose eviction emits nothing to await)
  private val p2Batch2b: Seq[Ev] = Seq((2L, 11L, 31L, 2L, true, ts(62)))
  // re-appearance strictly AFTER the trigger batch's watermark (62):
  // anything at or before it would be dropped as late data
  private val p1Batch3: Seq[Ev] = Seq(
    (1L, 20L, 12L, 6L, true, ts(70)), (1L, 21L, 22L, 3L, false, ts(71)))

  private def awaitSink(label: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) Thread.sleep(100)
    assert(pred, s"timed out waiting for: $label")
  }

  private def watermarked(mem: MemoryStream[Ev]) =
    mem.toDF.toDF("product", "seq", "price", "qty", "is_bid", "ts")
      .withWatermark("ts", "0 seconds")

  private def drive(out: org.apache.spark.sql.DataFrame, name: String,
                    afterB1: String, b1Done: => Boolean,
                    afterB2: String, b2Done: => Boolean, b2bDone: => Boolean,
                    afterB3: String, b3Done: => Boolean)(
      mem: MemoryStream[Ev]): Unit = {
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(p1Batch1)
      awaitSink(afterB1)(b1Done)
      mem.addData(p2Batch2) // advances the watermark past p1's timeout
      awaitSink(afterB2)(b2Done)
      mem.addData(p2Batch2b) // fires p1's eviction deterministically
      awaitSink(s"$afterB2 (trigger)")(b2bDone)
      mem.addData(p1Batch3)
      awaitSink(afterB3)(b3Done)
    } finally query.stop()
  }

  test("replay stream: a 1-hour timeline in seconds of wall clock evicts " +
    "by event time; re-appearance folds on a fresh book") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    def sink = spark.table("replay_et_timeout")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    val t0 = System.nanoTime()
    drive(OrderBookStream.topNLevelsFromPriceUpdates(
        watermarked(mem), "price", "qty", "is_bid", 1, "product", "seq",
        idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts")),
      "replay_et_timeout",
      "batch-1 rows", sink.count(_._1 == 1L) == 3,
      "batch-2 row", sink.exists(_._2 == 10L), sink.exists(_._2 == 11L),
      "batch-3 rows", sink.exists(_._2 == 21L))(mem)
    val wallSecs = (System.nanoTime() - t0) / 1e9
    assert(wallSecs < 120.0,
      f"the whole 1-hour timeline must replay in seconds, took $wallSecs%.0f s")
    // seq 20 re-appears on a FRESH book: bid 12 set, ask side EMPTY
    // (batch 1's ask 20/7 would still be there had the state survived)
    val reappear = sink.find(r => r._1 == 1L && r._2 == 20L).get
    assert(reappear._3.contains(12L) && reappear._4.isEmpty,
      s"fresh book expected after event-time eviction, got $reappear")
  }

  test("summary stream: the eviction tombstone behaves identically to the " +
    "processing-time mode (final superseding row, fresh incarnation after)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    def sink = spark.table("summary_et_timeout")
      .select("product", "emit", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    drive(OrderBookStream.analyticsSummaryStream(
        watermarked(mem), "price", "qty", "is_bid", "product", "seq",
        idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts")),
      "summary_et_timeout",
      "batch-1 summary row", sink.exists(r => r._1 == 1L && r._3 == 3L),
      "batch-2 summary row", sink.exists(r => r._1 == 2L && r._3 == 1L),
      // the trigger batch must ALSO surface p1's eviction tombstone
      sink.exists(r => r._1 == 1L && r._2 == 1L),
      "re-appearance row", sink.exists(r => r._1 == 1L && r._3 == 2L))(mem)
    val p1 = sink.filter(_._1 == 1L).sortBy(_._2)
    // exactly the processing-time contract: batch-1 row (emit 0,
    // 3 events), tombstone with the SAME totals (emit 1), fresh
    // incarnation restarting both counters and emit
    assert(p1.count(r => r._2 == 0L && r._3 == 3L) == 1, s"$p1")
    assert(p1.count(r => r._2 == 1L && r._3 == 3L) == 1,
      s"event-time eviction must emit the same final row: $p1")
    assert(p1.count(r => r._2 == 0L && r._3 == 2L) == 1,
      s"re-appearance must restart counters and emit: $p1")
  }

  test("ofi stream: event-time eviction discards cum_ofi like the " +
    "processing-time mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    def sink = spark.table("ofi_et_timeout")
      .select("product", "seq", "cum_ofi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    drive(OrderBookStream.ofiFromPriceUpdates(
        watermarked(mem), "price", "qty", "is_bid", "product", "seq",
        idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts")),
      "ofi_et_timeout",
      "batch-1 rows", sink.count(_._1 == 1L) == 3,
      "batch-2 row", sink.exists(_._2 == 10L), sink.exists(_._2 == 11L),
      "batch-3 rows", sink.exists(_._2 == 21L))(mem)
    val rows = sink
    val before = rows.filter(r => r._1 == 1L && r._2 <= 2L).maxBy(_._2)._3
    assert(before != 0L, "fixture must accumulate a nonzero cum_ofi")
    val after = rows.filter(r => r._1 == 1L && r._2 >= 20L).sortBy(_._2)
    assert(after.nonEmpty && after.head._3 == 0L,
      s"cum_ofi must restart from 0 after event-time eviction, got $after")
  }

  test("packed book state is version-tagged; unversioned checkpoint blobs " +
    "are rejected loudly instead of misread") {
    val blob = graft.core.BookCodec.serialize(new graft.core.OrderBook(2))
    for (ev <- Seq(Long.MinValue, -1L, 0L, 1767265200000L, Long.MaxValue)) {
      val packed = OrderBookStream.packBookState(blob, ev)
      assert(packed(0) == OrderBookStream.StateVersion)
      val (b2, ev2) = OrderBookStream.unpackBookState(packed)
      assert(java.util.Arrays.equals(b2, blob) && ev2 == ev, s"maxEv=$ev")
    }
    // the round-13 envelope (blob + 8-byte tail, NO tag): its first byte
    // is 0x00 (BookCodec opens with writeInt(n), n ≤ 20) — must reject,
    // not silently strip 8 BookCodec bytes into a bogus maxEv
    val untagged = java.util.Arrays.copyOf(blob, blob.length + 8)
    val e = intercept[IllegalArgumentException](
      OrderBookStream.unpackBookState(untagged))
    assert(e.getMessage.contains("fresh checkpoint"))
    // the pre-tail era (plain BookCodec blob) rejects identically
    val e2 = intercept[IllegalArgumentException](
      OrderBookStream.unpackBookState(blob))
    assert(e2.getMessage.contains("fresh checkpoint"))
  }

  test("no watermark + event-time eviction is rejected at analysis") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = OrderBookStream.topNLevelsFromPriceUpdates(
      mem.toDF.toDF("product", "seq", "price", "qty", "is_bid", "ts"),
      "price", "qty", "is_bid", 1, "product", "seq",
      idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts"))
    val e = intercept[Exception] {
      val q = out.writeStream.format("memory").queryName("no_wm_reject")
        .outputMode("append").start()
      try { mem.addData(p1Batch1); q.processAllAvailable() }
      finally q.stop()
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("watermark"),
      s"expected a watermark-required rejection, got: ${e.getMessage}")
  }
}
