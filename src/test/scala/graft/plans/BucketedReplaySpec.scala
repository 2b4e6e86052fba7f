package graft.plans

import graft.SparkTestSession
import graft.operators.OrderBookOps
import graft.queries.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB deployment claim, verified: because BboReplayExec declares
  * its required distribution, a table bucketed by the partition keys
  * satisfies it and the replay plans with ZERO shuffles — the scan feeds
  * the fold directly (plus a cheap in-partition sort; Spark does not
  * propagate bucket sort metadata, SPARK-19256). */
class BucketedReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed-by-product input plans the replay without any Exchange") {
    val stream = EventStreams.bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    spark.sql("DROP TABLE IF EXISTS graft_events_bucketed")
    // a crashed prior run can leave the managed location behind
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_events_bucketed")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
    stream.write.mode("overwrite").bucketBy(4, "product").sortBy("product", "seq")
      .saveAsTable("graft_events_bucketed")
    val bucketed = spark.table("graft_events_bucketed")

    val out = OrderBookOps.topNLevelsFromPriceUpdates(
      bucketed, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("BboReplay"))

    // and the result still matches the shuffled path
    val viaShuffle = OrderBookOps.topNLevelsFromPriceUpdates(
      stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
    val a = out.orderBy("product", "seq").collect()
    val b = viaShuffle.orderBy("product", "seq").collect()
    assert(a.length == 1000 && a.toSeq == b.toSeq)
  }

  test("bucketed input also plans sessionization without any Exchange") {
    // the sessionize windows require ClusteredDistribution(user_id);
    // a table bucketed by user_id satisfies it directly — the whole
    // lag → running-last → rollup chain runs shuffle-free on the scan
    val bucketed = spark.table("graft_events_bucketed")
    val out = graft.operators.Sessionize.sessionStats(
      bucketed.select(col("product").as("k"), col("seq").as("t")),
      "t", Seq("k"), maxGap = 50L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
