package graft.streaming

import graft.SparkTestSession
import graft.operators.OrderBookOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Failure-recovery proof for the streaming replay: stop the query after
  * day 1, then start a NEW query from the same checkpoint — the file
  * source resumes from committed offsets and flatMapGroupsWithState
  * restores every product's book state from the state store, so day-2
  * output equals the uninterrupted batch replay. This is the property a
  * production restart (crash, deploy, rescale) actually relies on; the
  * BookCheckpoint operator proves the same law for the BATCH serving
  * path, this spec proves it for the state-store path. */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkDirs(): (java.io.File, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toFile
    val in = new java.io.File(root, "in"); in.mkdirs()
    (root, in.getPath, new java.io.File(root, "ckpt").getPath,
      new java.io.File(root, "out").getPath)
  }

  // deterministic two-product event grid with adds and removals so the
  // book carries non-trivial depth ACROSS the restart boundary
  private def events(n: Int): Seq[(Long, Long, Long, Long, Boolean)] =
    (1 to n).map { i =>
      val seq = i.toLong
      (seq % 2, seq, 50 + (seq * 7) % 11, (seq * 3) % 5, seq % 3 == 0)
    }

  test("O1 restart from checkpoint == uninterrupted batch replay") {
    val (_, inDir, ckpt, outDir) = mkDirs()
      val all = events(60)
      val (day1, day2) = all.partition(_._2 <= 30)
      val cols = Seq("product", "seq", "price", "qty", "is_bid")
      val schema = day1.toDF(cols: _*).schema

      def runOnce(): Unit = {
        val sdf = spark.readStream.schema(schema).parquet(inDir)
        val out = OrderBookStream.topNLevelsFromPriceUpdates(
          sdf, "price", "qty", "is_bid", n = 2,
          partitionBy = "product", orderBy = "seq")
        val q = out.writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      day1.toDF(cols: _*).coalesce(1).write.mode("append").parquet(inDir)
      runOnce() // day 1, then the query goes away entirely
      day2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(inDir)
      runOnce() // NEW query: offsets + book state restored from ckpt

      val streamed = spark.read.parquet(outDir)
        .orderBy("product", "seq").collect()
      val batch = OrderBookOps.topNLevelsFromPriceUpdates(
          all.toDF(cols: _*), "price", "qty", "is_bid", 2,
          Seq("product"), Seq("seq"))
        .select(col("product") +: col("seq") +:
          OrderBookOps.bboFieldNames(2).map(col): _*)
        .orderBy("product", "seq").collect()
      assert(streamed.length == 60 && batch.length == 60)
      streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("O3 (modify) restart from checkpoint == uninterrupted batch replay") {
    val (_, inDir, ckpt, outDir) = mkDirs()
      // one order per (product, slot) chain modified repeatedly; prevs
      // from the chain's own history (the bboModifyReal derivation) —
      // day-2 prevs reference DAY-1 state, so recovery must restore it
      val base = events(40)
      val slotted = base.map { case (p, s, px, q, b) => (p, s, px, 1L + q, b, (s * 31) % 4) }
      val byChain = slotted.groupBy(t => (t._1, t._5, t._6))
      val withPrev = byChain.values.flatMap { chain =>
        val sorted = chain.sortBy(_._2)
        sorted.zipWithIndex.map { case ((p, s, px, q, b, _), i) =>
          if (i == 0) (p, s, px, q, b, None: Option[Long], None: Option[Long])
          else {
            val (_, _, ppx, pq, _, _) = sorted(i - 1)
            (p, s, px, q, b, Some(ppx), Some(pq))
          }
        }
      }.toSeq.sortBy(_._2)
      val (day1, day2) = withPrev.partition(_._2 <= 20)
      val cols = Seq("product", "seq", "price", "qty", "is_bid", "prev_price", "prev_qty")
      val schema = withPrev.toDF(cols: _*).schema

      def runOnce(): Unit = {
        val sdf = spark.readStream.schema(schema).parquet(inDir)
        val out = OrderBookStream.topNLevelsFromPriceMutationsWithModify(
          sdf, "price", "qty", "is_bid", "prev_price", "prev_qty", n = 2,
          partitionBy = "product", orderBy = "seq")
        val q = out.writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      day1.toDF(cols: _*).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      day2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(inDir)
      runOnce()

      val streamed = spark.read.parquet(outDir)
        .orderBy("product", "seq").collect()
      val batch = OrderBookOps.topNLevelsFromPriceMutationsWithModify(
          withPrev.toDF(cols: _*), "price", "qty", "is_bid",
          "prev_price", "prev_qty", 2, Seq("product"), Seq("seq"))
        .select(col("product") +: col("seq") +:
          OrderBookOps.bboFieldNames(2).map(col): _*)
        .orderBy("product", "seq").collect()
      assert(streamed.length == withPrev.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
