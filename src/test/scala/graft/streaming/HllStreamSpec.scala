package graft.streaming

import graft.SparkTestSession
import graft.pipeline.StatsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL registers: the micro-batched fold must equal the batch
  * register relation (and therefore the batch estimate), and replaying
  * a batch must change nothing — register max is idempotent, which is
  * the at-least-once story. */
class HllStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows: Seq[(String, String)] =
    (0 until 1500).map(i => ("g1", s"a$i")) ++
      (0 until 400).map(i => ("g2", s"b$i"))

  test("streamed registers across micro-batches == batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = PipelineStreams.hllRegisterStream(
      mem.toDF.toDF("g", "v"), Seq("g"), col("v"), m = 128)
    val query = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(900)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      // replay batch 2 verbatim: at-least-once delivery must be a no-op
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("hll_stream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = StatsOps.hllRegisters(rows.toDF("g", "v"), Seq("g"),
        col("v"), m = 128)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)

    // and the estimate off the streamed registers equals the batch path
    val est = StatsOps.hllEstimateFromRegisters(
        spark.table("hll_stream"), Seq("g"), m = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEst = StatsOps.hllEstimateByGroup(rows.toDF("g", "v"),
        Seq("g"), col("v"), m = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == batchEst)
  }
}
