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

  test("foreachBatch ingestion into the stored index == one-shot build") {
    // the serving loop the docstring promises: each micro-batch folds
    // into the persisted register index as a new epoch (first batch
    // builds, later ones append), and the storage-side estimate ends
    // up identical to a one-shot build over everything that arrived
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("hll_stream_idx")
      d.toFile.deleteOnExit(); s"$d/idx"
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val query = mem.toDF.toDF("g", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        if (!new java.io.File(s"$dir/meta").exists())
          StatsOps.writeHllIndex(batch, Seq("g"), col("v"), dir, m = 128)
        else
          StatsOps.appendHllIndex(batch.sparkSession, dir, batch, col("v"))
      }
      .start()
    try {
      val (b1, b2) = rows.splitAt(700)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()

    val meta = StatsOps.readHllIndexMeta(spark, dir)
    assert(meta.epoch >= 1L, "append path must have produced a new epoch")
    val stored = StatsOps.estimateFromStoredHll(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = StatsOps.hllEstimateByGroup(rows.toDF("g", "v"),
        Seq("g"), col("v"), m = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == oneShot)
  }
}
