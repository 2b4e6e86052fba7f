package graft.plans

import graft.SparkTestSession
import graft.pipeline.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-free daily-dedup claim, verified: hash content once at
  * ingest, store batch and digest index bucketed by content_hash, and
  * the whole incremental dedup pass — history anti-join + in-batch
  * keep-min-id window — plans with ZERO exchanges. The digest-keyed
  * twin of BucketedReplaySpec. */
class BucketedDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed-by-digest batch and index dedup with zero exchanges") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"content ${i % 60}")).toDF("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("content_hash", DedupOps.digest(col("text")))
    val index = docs.filter(col("doc_id") % 2 === 0)
      .select(DedupOps.digest(col("text")).as("content_hash")).distinct()

    dropTable("graft_dedup_batch"); dropTable("graft_dedup_index")
    batch.write.mode("overwrite").bucketBy(4, "content_hash")
      .sortBy("content_hash").saveAsTable("graft_dedup_batch")
    index.write.mode("overwrite").bucketBy(4, "content_hash")
      .saveAsTable("graft_dedup_index")

    val out = DedupOps.dedupAgainstIndexPrehashed(
      spark.table("graft_dedup_batch"), spark.table("graft_dedup_index"),
      "doc_id")
    // no data ever shuffles: the window's clustering is satisfied by the
    // bucketed scan, and the anti-join either broadcasts the (narrow)
    // index or — below — rides the bucket layout as an exchange-free SMJ
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$plan")
    // with broadcast disabled, the bucketed layout alone must carry the
    // join: zero exchanges of ANY kind
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smjPlan = DedupOps.dedupAgainstIndexPrehashed(
          spark.table("graft_dedup_batch"), spark.table("graft_dedup_index"),
          "doc_id")
        .queryExecution.executedPlan.toString
      assert(!smjPlan.contains("Exchange"), s"unexpected exchange in:\n$smjPlan")
      assert(smjPlan.contains("SortMergeJoin"), smjPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)

    // result parity with the expression-based (shuffling) path
    val expected = DedupOps.dedupAgainstIndex(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)
          .select(DedupOps.digest(col("text")).as("content_hash")).distinct(),
        "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val got = out.select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }
}
