package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the snapshot lifecycle: per-doc diff classification and
  * delta-merge (upsert + tombstone) semantics, plus the roundtrip law
  * tying them together — applying the delta the diff reports must
  * reproduce the new snapshot exactly. */
class SnapshotOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private val dig = TextOps.fingerprint(col("text"))

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    val old = snap((1L, "same text", "web"), (2L, "old version", "web"),
      (3L, "will vanish", "books"))
    val nw = snap((1L, "same text", "web"), (2L, "new version", "web"),
      (4L, "brand new", "books"))
    val got = SnapshotOps.snapshotDiff(old, nw, "doc_id", dig, Seq("source"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got == Map(
      1L -> (("unchanged", "web")),
      2L -> (("changed", "web")),
      3L -> (("removed", "books")),
      4L -> (("added", "books"))))
  }

  test("applyDelta: upsert replaces, insert appends, tombstones drop, " +
    "absent-id delete is a no-op") {
    val base = snap((1L, "keep", "web"), (2L, "stale", "web"),
      (3L, "doomed", "books"))
    val upserts = snap((2L, "fresh", "web"), (9L, "inserted", "books"))
    val deletes = Seq(3L, 77L).toDF("doc_id") // 77 never existed
    val got = SnapshotOps.applyDelta(base, upserts, deletes, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set((1L, "keep", "web"), (2L, "fresh", "web"),
      (9L, "inserted", "books")))
  }

  test("roundtrip: applyDelta(old, diff's upserts, diff's removals) == new") {
    val old = snap((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"),
      (4L, "d", "s2"))
    val nw = snap((1L, "a", "s1"), (2L, "B2", "s1"), (4L, "d", "s2"),
      (5L, "e", "s3"))
    val diff = SnapshotOps.snapshotDiff(old, nw, "doc_id", dig, Seq("source"))
    val upsertIds = diff.filter(col("status").isin("added", "changed"))
      .select("doc_id")
    val deletes = diff.filter(col("status") === "removed").select("doc_id")
    val upserts = nw.join(upsertIds, Seq("doc_id"), "left_semi")
    val merged = SnapshotOps.applyDelta(old, upserts, deletes, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val expected = nw
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(merged == expected)
  }

  test("diff statuses partition both id sets; carry prefers the new side") {
    val old = snap((1L, "x", "OLDSRC"), (2L, "y", "s"))
    val nw = snap((1L, "x2", "NEWSRC"))
    val rows = SnapshotOps.snapshotDiff(old, nw, "doc_id", dig, Seq("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // changed doc carries the NEW source; removed doc falls back to old
    assert(rows.toSet == Set((1L, "changed", "NEWSRC"), (2L, "removed", "s")))
  }

  test("snapshotDiff refuses duplicated ids loudly, per side — and " +
    "construction stays a lazy plan builder (no jobs until the action)") {
    val clean = snap((1L, "a", "s"), (2L, "b", "s"))
    val duped = snap((1L, "a", "s"), (1L, "a again", "s"), (2L, "b", "s"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // constructing the diff runs NOTHING (the guard is in-plan) — the
    // duplicate surfaces at the action
    val lazyDiff = SnapshotOps.snapshotDiff(duped, clean, "doc_id", dig, Seq("source"))
    val eOld = intercept[Exception] { lazyDiff.collect() }
    assert(msgs(eOld).exists(_.contains("old snapshot has duplicate doc_id")))
    val eNew = intercept[Exception] {
      SnapshotOps.snapshotDiff(clean, duped, "doc_id", dig, Seq("source")).collect()
    }
    assert(msgs(eNew).exists(_.contains("new snapshot has duplicate doc_id")))
    // documented opt-out: the caller owns uniqueness, the join fans out
    val rows = SnapshotOps.snapshotDiff(duped, clean, "doc_id", dig,
      Seq("source"), assertUniqueIds = false)
      .filter(col("doc_id") === 1L).collect()
    assert(rows.length == 2) // the silent fan-out the guard exists to stop
  }
}
