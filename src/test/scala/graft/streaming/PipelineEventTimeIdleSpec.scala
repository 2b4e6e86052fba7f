package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event-time idle eviction for the PIPELINE stateful twins — the
  * discipline the book streams got in round 13
  * (state-carried all-time max event time; eviction when the watermark
  * passes it + timeout), now on `tokenBudgetStream` and
  * `upsertViewStream`: a one-hour event timeline replayed in seconds of
  * wall clock under a TEN-MINUTE idle timeout still evicts — only
  * possible keyed to the watermark — and the documented post-eviction
  * trades hold (budgets restart per incarnation; an old delta re-emits
  * as current once its id's state is gone). Driving discipline from
  * EventTimeIdleSpec: evictions that emit nothing cannot be awaited, so
  * a TRIGGER batch on the other group lands post-watermark and its row
  * is awaited; re-appearances sit strictly after the advanced
  * watermark or they drop as late data. */
class PipelineEventTimeIdleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1767265200000L + minutes * 60000L) // 2026-01-01T11:00Z

  private def awaitSink(label: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) Thread.sleep(100)
    assert(pred, s"timed out waiting for: $label")
  }

  test("token budget stream: an idle group's spent budget evicts on the " +
    "DATA's timeline; the group re-appears with a fresh budget") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val sdf = mem.toDF.toDF("source", "doc_id", "n_tokens", "ts")
      .withWatermark("ts", "0 seconds")
    val out = PipelineStreams.tokenBudgetStream(sdf, "source", "doc_id",
      "n_tokens", budget = 10L,
      idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts"))
    val query = out.writeStream.format("memory").queryName("budget_et")
      .outputMode("append").start()
    def sink = spark.table("budget_et")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val t0 = System.nanoTime()
    try {
      // minute 0: group a admits 1 and 2 (exclusive prefix overshoots
      // to 13 >= 10) — the budget is now EXHAUSTED
      mem.addData(("a", 1L, 8L, ts(0)), ("a", 2L, 5L, ts(0)))
      awaitSink("batch-1 rows")(sink == Set(1L, 2L))
      // an hour later, group b advances the watermark past a's timeout
      mem.addData(("b", 10L, 1L, ts(60)))
      awaitSink("batch-2 row")(sink.contains(10L))
      mem.addData(("b", 11L, 1L, ts(62))) // trigger: fires a's eviction
      awaitSink("trigger row")(sink.contains(11L))
      // group a re-appears: a FRESH budget admits the doc a live
      // incarnation (used 13 >= 10) would reject — the per-incarnation
      // trade, observed
      mem.addData(("a", 20L, 4L, ts(70)))
      awaitSink("re-appearance row")(sink.contains(20L))
    } finally query.stop()
    val wallSecs = (System.nanoTime() - t0) / 1e9
    assert(wallSecs < 120.0,
      f"the 1-hour timeline must replay in seconds, took $wallSecs%.0f s")
  }

  test("token budget stream without a timeout still rejects the exhausted " +
    "group an hour later (the eviction is opt-in, not a default drift)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val sdf = mem.toDF.toDF("source", "doc_id", "n_tokens", "ts")
    val out = PipelineStreams.tokenBudgetStream(sdf, "source", "doc_id",
      "n_tokens", budget = 10L)
    val query = out.writeStream.format("memory").queryName("budget_noet")
      .outputMode("append").start()
    def sink = spark.table("budget_noet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      mem.addData(("a", 1L, 8L, ts(0)), ("a", 2L, 5L, ts(0)))
      awaitSink("batch-1 rows")(sink == Set(1L, 2L))
      mem.addData(("b", 10L, 1L, ts(60)))
      awaitSink("batch-2 row")(sink.contains(10L))
      mem.addData(("a", 20L, 4L, ts(70)), ("b", 12L, 1L, ts(70)))
      awaitSink("batch-3 marker")(sink.contains(12L))
      assert(!sink.contains(20L),
        "without a timeout the exhausted budget must persist")
    } finally query.stop()
  }

  test("upsert view: an idle id's state evicts on the data's timeline; " +
    "a replayed OLD delta then re-emits as current — the documented trade") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Boolean, Long, java.sql.Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "ver", "deleted", "dig", "ts")
      .withWatermark("ts", "0 seconds")
    val out = PipelineStreams.upsertViewStream(sdf, "doc_id", "ver",
      "deleted", "dig",
      idleTimeout = Some("10 minutes"), eventTimeCol = Some("ts"))
    val query = out.writeStream.format("memory").queryName("upsert_et")
      .outputMode("append").start()
    def sink = spark.table("upsert_et")
      .select("doc_id", "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    try {
      // minute 0: doc 1 at version 5
      mem.addData((1L, 5L, false, 15L, ts(0)))
      awaitSink("batch-1 row")(sink.contains((1L, 5L)))
      // stale v3 in the SAME incarnation is swallowed (existing
      // contract), and doc 2 advances the watermark an hour later
      mem.addData((1L, 3L, false, 13L, ts(1)))
      mem.addData((2L, 1L, false, 21L, ts(60)))
      awaitSink("batch-2 row")(sink.contains((2L, 1L)))
      assert(!sink.contains((1L, 3L)), "stale delta must be swallowed live")
      mem.addData((2L, 2L, false, 22L, ts(62))) // trigger: doc 1 evicts
      awaitSink("trigger row")(sink.contains((2L, 2L)))
      // the replayed old delta now lands on EMPTY state → re-emits as
      // current: the per-incarnation trade the scaladoc states (batch
      // snapshot roll-forward owns cross-gap exactness)
      mem.addData((1L, 3L, false, 13L, ts(70)))
      awaitSink("re-appearance row")(sink.contains((1L, 3L)))
    } finally query.stop()
  }
}
