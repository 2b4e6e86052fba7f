package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min frequency sketch: the one-sided error contract (estimate
  * never BELOW the true count), the bounded cell relation, exactness
  * when the width dominates the key space, merge associativity, and
  * the no-false-negative heavy-hitter guarantee. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic zipf-ish stream: item i appears ~N/(i+1) times
  private def zipfish(group: String, items: Int, scale: Int) =
    (0 until items).flatMap(i => Seq.fill(scale / (i + 1))((group, s"item$i")))

  private def exactCounts(rows: Seq[(String, String)]) =
    rows.groupBy(identity).map { case ((g, v), xs) => (g, v) -> xs.size.toLong }

  test("estimate is NEVER below the exact count (narrow width forces collisions)") {
    val rows = zipfish("g", 200, 400) // ~1,180 occurrences, 200 keys
    val df = rows.toDF("g", "v")
    val cells = StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 4, width = 16)
    val est = StatsOps.cmsEstimate(cells, df.distinct(), Seq("g"), "v", 4, 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = exactCounts(rows)
    assert(est.size == 200)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} below exact $n — CMS broke its one-sided bound")
    }
    // at width=16 with 200 keys, collisions MUST have produced at
    // least one strict overestimate, or the test exercises nothing
    assert(exact.exists { case (k, n) => est(k) > n },
      "no collision at width=16 over 200 keys — the stress leg is inert")
  }

  test("wide sketch is exact; unseen probes estimate 0 when their cells are empty") {
    val rows = zipfish("g", 30, 100)
    val df = rows.toDF("g", "v")
    val cells = StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 4, width = 1 << 16)
    val probes = (rows.map(_._2).distinct ++ Seq("neverseen1", "neverseen2"))
      .map(("g", _)).toDF("g", "v")
    val est = StatsOps.cmsEstimate(cells, probes, Seq("g"), "v", 4, 1 << 16)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = exactCounts(rows)
    exact.foreach { case ((_, v), n) => assert(est(v) == n) }
    // 34 occupied cell addresses in a 65,536-wide row: the unseen
    // probes' minima land on empty cells with overwhelming odds, and
    // the left-join→coalesce(0) path is what this pins
    assert(est("neverseen1") == 0L && est("neverseen2") == 0L)
  }

  test("cell relation is bounded by groups x depth x width and counts preserve mass") {
    val rows = zipfish("a", 500, 300) ++ zipfish("b", 100, 200)
    val cells = StatsOps.cmsCells(rows.toDF("g", "v"), Seq("g"), col("v"),
      depth = 3, width = 32).collect()
    assert(cells.length <= 2 * 3 * 32)
    // every depth row sees every occurrence exactly once: per (group, j)
    // the cell counts sum to that group's total item count
    val byGj = cells.groupBy(r => (r.getString(0), r.getInt(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)).sum }
    val total = rows.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }
    byGj.foreach { case ((g, _), s) => assert(s == total(g)) }
  }

  test("write -> append -> stored estimates == one-shot estimates over the union") {
    val day1 = zipfish("g1", 80, 160) ++ zipfish("g2", 40, 80)
    val day2 = zipfish("g1", 120, 90) // overlapping keys re-sent: sums must fold
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("cms_idx_roundtrip")
      d.toFile.deleteOnExit(); s"$d/idx"
    }
    StatsOps.writeCmsIndex(day1.toDF("g", "v"), Seq("g"), col("v"), dir,
      depth = 4, width = 64)
    StatsOps.appendCmsIndex(spark, dir, day2.toDF("g", "v"), col("v"))
    val all = (day1 ++ day2).toDF("g", "v")
    val stored = StatsOps.estimateFromStoredCms(spark, dir, all.distinct(), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val oneShot = StatsOps.cmsEstimate(
        StatsOps.cmsCells(all, Seq("g"), col("v"), 4, 64),
        all.distinct(), Seq("g"), "v", 4, 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(stored == oneShot)
    val meta = StatsOps.readCmsIndexMeta(spark, dir)
    assert(meta.epoch == 1L && meta.depth == 4 && meta.width == 64 &&
      meta.groupCols == Seq("g"))
    assert(meta.cellRows <= 2L * 4 * 64)
    assert(new java.io.File(s"$dir/cells/e0").exists(),
      "superseded epoch must survive one commit (reader grace window)")
  }

  test("heavy hitters: no false negatives, and the eval form measures the band") {
    val rows = zipfish("g", 300, 600) // head items far above minFreq
    val minFreq = 20L
    val exact = exactCounts(rows)
    val flagged = StatsOps.cmsHeavyHittersWithExact(rows.toDF("g", "v"),
        Seq("g"), col("v"), depth = 4, width = 32, minFreq, itemCol = "v")
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case ((_, v), n) =>
      if (n >= minFreq)
        assert(flagged.contains(v), s"$v (exact $n) missing — CMS false negative is impossible")
    }
    flagged.foreach { case (v, (nExact, est)) =>
      assert(est >= nExact, s"$v: est $est < exact $nExact")
      assert(exact(("g", v)) == nExact)
      assert(est >= minFreq)
    }
  }

  test("streaming ingest is exactly-once: replays no-op, regressions refuse") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("cms_idx_ingest")
      d.toFile.deleteOnExit(); s"$d/idx"
    }
    val b0 = zipfish("g", 50, 100)
    val b1 = zipfish("g", 50, 60)
    val b2 = zipfish("g", 20, 40)
    assert(StatsOps.ingestCmsBatch(spark, dir, b0.toDF("g", "v"), Seq("g"),
      col("v"), batchId = 0L, depth = 4, width = 128))
    assert(StatsOps.ingestCmsBatch(spark, dir, b1.toDF("g", "v"), Seq("g"),
      col("v"), batchId = 1L))
    assert(StatsOps.ingestCmsBatch(spark, dir, b2.toDF("g", "v"), Seq("g"),
      col("v"), batchId = 2L))
    def snap() = {
      val all = (b0 ++ b1 ++ b2).toDF("g", "v")
      StatsOps.estimateFromStoredCms(spark, dir, all.distinct(), "v")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    val before = snap()
    // a foreachBatch retry re-sends the last batch: must be a no-op
    assert(!StatsOps.ingestCmsBatch(spark, dir, b2.toDF("g", "v"), Seq("g"),
      col("v"), batchId = 2L))
    assert(snap() == before, "replayed batch double-counted")
    // the applied stream ≡ one-shot over the concatenation
    val all = (b0 ++ b1 ++ b2).toDF("g", "v")
    val oneShot = StatsOps.cmsEstimate(
        StatsOps.cmsCells(all, Seq("g"), col("v"), 4, 128),
        all.distinct(), Seq("g"), "v", 4, 128)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(before == oneShot)
    // an id regressing past the one-batch replay window refuses loudly
    val e = intercept[IllegalArgumentException] {
      StatsOps.ingestCmsBatch(spark, dir, b0.toDF("g", "v"), Seq("g"),
        col("v"), batchId = 0L)
    }
    assert(e.getMessage.contains("regressed"))
  }

  test("segment ledger: a re-dropped named slice is a no-op, new names fold once") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("cms_idx_seg")
      d.toFile.deleteOnExit(); s"$d/idx"
    }
    val day1 = zipfish("g", 40, 80)
    val day2 = zipfish("g", 40, 50)
    assert(StatsOps.ingestCmsSegment(spark, dir, day1.toDF("g", "v"),
      Seq("g"), col("v"), "crawl/day1", depth = 4, width = 128))
    assert(StatsOps.ingestCmsSegment(spark, dir, day2.toDF("g", "v"),
      Seq("g"), col("v"), "crawl/day2"))
    // the orchestrator retries day2: covered, so a no-op
    assert(!StatsOps.ingestCmsSegment(spark, dir, day2.toDF("g", "v"),
      Seq("g"), col("v"), "crawl/day2"))
    val all = (day1 ++ day2).toDF("g", "v")
    val stored = StatsOps.estimateFromStoredCms(spark, dir, all.distinct(), "v")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val oneShot = StatsOps.cmsEstimate(
        StatsOps.cmsCells(all, Seq("g"), col("v"), 4, 128),
        all.distinct(), Seq("g"), "v", 4, 128)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(stored == oneShot, "re-drop double-counted or a segment went missing")
    // an unledgered append carries the ledger forward untouched
    StatsOps.appendCmsIndex(spark, dir,
      zipfish("g", 10, 20).toDF("g", "v"), col("v"))
    assert(!StatsOps.ingestCmsSegment(spark, dir, day2.toDF("g", "v"),
      Seq("g"), col("v"), "crawl/day2"),
      "append dropped the covered-segments ledger")
  }

  test("property sweep: one-sided bound + split-merge associativity across geometries") {
    // deterministic adversarial stream (no RNG): three groups, per-item
    // keyspaces that shrink and grow so counts range from 1 to hundreds,
    // plus values that collide textually across groups
    val stream = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      val keyspace = 1 + (i * 7919) % 120
      (g, s"k${(i * 31 + (i * i) % 17) % keyspace}")
    }
    val exact = exactCounts(stream)
    val df = stream.toDF("g", "v")
    for ((d, w) <- Seq((1, 16), (2, 64), (4, 32), (8, 256))) {
      val cells = StatsOps.cmsCells(df, Seq("g"), col("v"), d, w)
      val est = StatsOps.cmsEstimate(cells, df.distinct(), Seq("g"), "v", d, w)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"d=$d w=$w $k: est ${est(k)} < exact $n")
      }
      // split-merge associativity, exact at the CELL level: the sketch
      // of the whole is the cell-wise SUM of the parts' sketches — the
      // algebra behind appendCmsIndex and any partial aggregation.
      // Split point varies with the geometry so each case cuts elsewhere.
      val cut = stream.size * ((d + w) % 6 + 1) / 8
      val (pa, pb) = stream.splitAt(cut)
      def cellMap(xs: Seq[(String, String)]) =
        StatsOps.cmsCells(xs.toDF("g", "v"), Seq("g"), col("v"), d, w)
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
      val whole = cellMap(stream)
      val parts = (cellMap(pa).toSeq ++ cellMap(pb).toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      assert(parts == whole, s"d=$d w=$w: split sketches do not sum to the whole")
    }
  }

  test("the estimate plan BROADCASTS the bounded cell relation: the " +
    "probe side streams through a BroadcastHashJoin and never " +
    "sort-merge-shuffles on the cell key") {
    // the scale claim behind cmsEstimate's scaladoc, asserted: the
    // cell relation is <= groups x depth x width rows at ANY corpus
    // size, so the join must resolve as a broadcast — a sort-merge
    // here would shuffle the (probe x depth) stream on (group, j,
    // cell) and grow with the workload
    val df = (0 until 500).map(i => ("g", s"k${i % 40}")).toDF("g", "v")
    val cells = StatsOps.cmsCells(df, Seq("g"), col("v"), 4, 256)
    val est = StatsOps.cmsEstimate(cells, df.distinct(), Seq("g"), "v",
      4, 256)
    est.collect()
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"cell join did not broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"probe side shuffled on the cell key:\n${plan.take(1500)}")
  }

  test("geometry guards are loud; appends inherit pinned geometry") {
    val df = Seq(("g", "x")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 0, width = 64) }
    intercept[IllegalArgumentException] {
      StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 9, width = 64) }
    intercept[IllegalArgumentException] {
      StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 4, width = 8) }
    intercept[IllegalArgumentException] {
      StatsOps.cmsCells(df, Seq("g"), col("v"), depth = 4, width = (1 << 20) + 1) }
    intercept[IllegalArgumentException] {
      StatsOps.cmsCells(df.withColumn("__cms_x", lit(1)), Seq("g"), col("v")) }
    // missing artifact fails with the labeled error, not a raw path error
    val e = intercept[IllegalStateException] {
      StatsOps.readCmsIndexMeta(spark, "/nonexistent/cms_idx") }
    assert(e.getMessage.contains("cms index"))
  }
}
