package graft.plans

import graft.SparkTestSession
import graft.pipeline.{DedupOps, SnapshotOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot-lifecycle scale claims, verified at the plan level:
  * with both crawls stored bucketed by doc id and digests computed at
  * ingest (the production shape — SnapshotOps scaladoc), the
  * crawl-over-crawl diff plans with ZERO exchanges, and the delta merge
  * never exchanges the base side. Sibling of BucketedDedupSpec /
  * BucketedReplaySpec. */
class BucketedSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

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

  // old crawl: ids 1..200 except ≡3 (mod 10); new crawl: except ≡7
  // (mod 10), text revised for ≡0 (mod 5) — every status populated
  private def crawl(revised: Boolean) = {
    val keep = if (revised) 7 else 3
    (1L to 200L).filter(_ % 10 != keep)
      .map(i => (i,
        if (revised && i % 5 == 0) s"doc $i rev2" else s"doc $i",
        s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
      .withColumn("dig", DedupOps.digest(col("text")))
  }

  test("bucketed-by-id snapshots diff with zero exchanges") {
    dropTable("graft_snap_old"); dropTable("graft_snap_new")
    crawl(revised = false).write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("graft_snap_old")
    crawl(revised = true).write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("graft_snap_new")

    val out = SnapshotOps.snapshotDiff(
      spark.table("graft_snap_old"), spark.table("graft_snap_new"),
      "doc_id", col("dig"), Seq("source"))
    // full-outer equi-join on the bucket key: the bucketed layout must
    // carry it outright — no exchange of ANY kind in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)

    // parity with the unbucketed path computing digests in-flight
    val expected = SnapshotOps.snapshotDiff(
        crawl(revised = false), crawl(revised = true),
        "doc_id", col("dig"), Seq("source"))
      .select("doc_id", "status").as[(Long, String)].collect().toSet
    val got = out.select("doc_id", "status").as[(Long, String)].collect().toSet
    assert(got == expected)
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(got.map(_._2)))
  }

  test("delta merge never exchanges the bucketed base") {
    dropTable("graft_snap_base")
    crawl(revised = false).write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("graft_snap_base")
    val base = spark.table("graft_snap_base")
    val nw = crawl(revised = true)
    val upserts = nw.filter(col("doc_id") % 10 === 3 || col("doc_id") % 5 === 0)
    val deletes = Seq.range(7L, 201L, 10L).toDF("doc_id")

    val merged = SnapshotOps.applyDelta(base, upserts, deletes, "doc_id")
    // the delta-sized dead-id side broadcasts; the base is probed in
    // place — no hash repartitioning anywhere
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)

    // and the roll-forward reproduces the new crawl exactly
    val got = merged.select("doc_id", "dig").as[(Long, String)].collect().toSet
    val expected = nw.select("doc_id", "dig").as[(Long, String)].collect().toSet
    assert(got == expected)
  }
}
