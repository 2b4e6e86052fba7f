package graft.streaming

import graft.SparkTestSession
import graft.pipeline.StatsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest of the quantile-sketch index: bucket counts are
  * NOT idempotent (a replayed micro-batch would double-count, unlike
  * HLL's register max), so the ingest records each applied batch id
  * behind the meta swap and skips replays — exactly-once on top of
  * foreachBatch's at-least-once. */
class QuantileStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 5
  private val perms = Seq(500, 900)
  private val rows: Seq[(String, Long)] =
    (0 until 3000).map(i => ("g", (i.toLong * 97 + 5) % 400000L))

  test("foreachBatch ingest == one-shot sketch; replayed batch ids are no-ops") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("qs_stream_idx")
      d.toFile.deleteOnExit(); s"$d/idx"
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val query = mem.toDF.toDF("g", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        StatsOps.ingestQuantileBatch(batch.sparkSession, dir, batch,
          Seq("g"), col("v"), batchId, S)
        () // Unit-typed for the Scala overload
      }
      .start()
    try {
      val (b1, b2) = rows.splitAt(1800)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()

    val meta = StatsOps.readQuantileIndexMeta(spark, dir)
    assert(meta.lastBatchId >= 1L, "two batches must have been recorded")
    val stored = StatsOps.quantilesFromStoredSketch(spark, dir, perms)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val oneShot = StatsOps.sketchQuantilesByGroup(rows.toDF("g", "v"),
        Seq("g"), col("v"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(stored == oneShot)

    // a foreachBatch RETRY re-delivers an already-applied batch id:
    // the guard must refuse it and the stored sketch must not move
    val replayApplied = StatsOps.ingestQuantileBatch(spark, dir,
      rows.take(1800).toDF("g", "v"), Seq("g"), col("v"),
      batchId = meta.lastBatchId, S)
    assert(!replayApplied, "replayed batch id must be a no-op")
    val after = StatsOps.quantilesFromStoredSketch(spark, dir, perms)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(after == stored, "replay must not move any quantile")
    assert(StatsOps.readQuantileIndexMeta(spark, dir).epoch == meta.epoch)

    // a genuinely new batch id still applies
    assert(StatsOps.ingestQuantileBatch(spark, dir,
      Seq(("g", 999999L)).toDF("g", "v"), Seq("g"), col("v"),
      batchId = meta.lastBatchId + 1, S))
    assert(StatsOps.readQuantileIndexMeta(spark, dir).lastBatchId ==
      meta.lastBatchId + 1)
  }
}
