package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout contract: the column-space interleave matches the
  * driver-side twin, and the written layout actually partition-prunes a
  * 2-D box probe — the property the operator exists for. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue (column space) == zValueOf (driver twin) on the full grid") {
    val bitsPer = 4
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = grid.toDF("a", "b")
      .withColumn("z", LayoutOps.zValue(col("a"), col("b"), bitsPer))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) == LayoutOps.zValueOf(a, b, bitsPer),
        s"mismatch at ($a,$b)")
    }
    // bijective over the grid: 256 distinct cells
    assert(got.values.toSet.size == 256)
  }

  test("rangeBucket is exact integer math over the whole domain") {
    val df = spark.range(0, 1000).toDF("v")
      .withColumn("bucket", LayoutOps.rangeBucket("v", 0L, 999L, 16))
    val buckets = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    buckets.foreach { case (v, b) =>
      assert(b == v * 16 / 1000, s"v=$v got $b")
      assert(b >= 0 && b < 16)
    }
  }

  test("rangeBucket survives wide spans (epoch-micros) without overflow") {
    // span ~1.6e18: (v - min) * 16 tops int64, so the narrow-span long
    // fast path would overflow (ANSI would throw, legacy would wrap) —
    // the DECIMAL(38,0) widening must produce the exact integer result
    val vMax = 1_600_000_000_000_000_000L
    val span = BigInt(vMax) + 1
    val vals = Seq(0L, 1L, 123_456_789_012_345_678L, vMax / 3, vMax / 2,
      vMax - 1, vMax)
    val got = vals.toDF("v")
      .withColumn("bucket", LayoutOps.rangeBucket("v", 0L, vMax, 16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    vals.foreach { v =>
      val expected = (BigInt(v) * 16 / span).toLong
      assert(got(v) == expected, s"v=$v got ${got(v)} want $expected")
      assert(got(v) >= 0 && got(v) < 16)
      // the driver-side probe twin must agree bucket-for-bucket
      assert(LayoutOps.bucketOf(v, 0L, vMax, 16) == expected)
    }
  }

  test("zCellsForBox refuses boxes wider than the enumeration cap") {
    // bitsPer=16 full grid = 2^32 cells; must fail loudly, not OOM
    val e = intercept[IllegalArgumentException] {
      LayoutOps.zCellsForBox(0, 65535, 0, 65535, 16)
    }
    assert(e.getMessage.contains("cells"))
    // a cap-sized box still enumerates
    assert(LayoutOps.zCellsForBox(0, 255, 0, 255, 16).size == 65536)
  }

  test("2-D box probe over the z-partitioned layout partition-prunes") {
    val bitsPer = 3 // 8x8 grid -> at most 64 partitions
    val n = 4000
    val df = spark.range(n).select(
      col("id"),
      (col("id") * 37 % 512).as("x"),
      (col("id") * 91 % 1024).as("y"))
    val laid = LayoutOps.zorderLayout(df, "x", "y", bitsPer)

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    laid.write.mode("overwrite").partitionBy("zcell").parquet(dir)

    // probe: buckets [2,3] x [4,6] -> 6 cells of 64
    val cells = LayoutOps.zCellsForBox(2, 3, 4, 6, bitsPer)
    assert(cells.size == 6)
    val probe = spark.read.parquet(dir)
      .filter(col("zcell").isin(cells: _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
      s"zcell probe did not partition-prune:\n$plan")

    // correctness: probe == brute-force box filter on the laid-out data
    val expected = laid
      .filter(col("cell_a").between(2, 3) && col("cell_b").between(4, 6))
      .select("id").as[Long].collect().toSet
    val got = probe.select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)

    // pruning is real: the probe reads strictly fewer files than exist
    val allFiles = new java.io.File(dir).listFiles().count(_.getName.startsWith("zcell="))
    assert(allFiles > 6, s"layout produced only $allFiles cells")
  }

  test("writeZordered/readZorderBox: value-box probe is exact and pruned") {
    val df = spark.range(3000).select(
      col("id"),
      (col("id") * 13 % 997).as("x"),
      (col("id") * 57 % 641).as("y"))
    val path = java.nio.file.Files.createTempDirectory("graft_zidx").toString
    LayoutOps.writeZordered(df, "x", "y", bitsPer = 3, path)

    val (aLo, aHi, bLo, bHi) = (100L, 260L, 300L, 410L)
    val probe = LayoutOps.readZorderBox(spark, path, aLo, aHi, bLo, bHi)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("zcell"), s"no partition prune in:\n$plan")

    val got = probe.select("id").as[Long].collect().toSet
    val expected = df
      .filter(col("x").between(aLo, aHi) && col("y").between(bLo, bHi))
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)

    // a box outside the written range returns nothing (edge clamp)
    assert(LayoutOps.readZorderBox(spark, path, 5000, 6000, 5000, 6000)
      .count() == 0L)
  }

  test("pinned-range writeZordered: appends land in stable cells") {
    val mk = (lo: Long, n: Long) => spark.range(lo, lo + n).select(
      col("id"),
      (col("id") * 13 % 997).as("x"),
      (col("id") * 57 % 641).as("y"))
    val batch1 = mk(0L, 1500L)
    val batch2 = mk(1500L, 1500L)
    val path = java.nio.file.Files.createTempDirectory("graft_zpin").toString
    val pinned = Some((0L, 996L, 0L, 640L))
    LayoutOps.writeZordered(batch1, "x", "y", 3, path, pinned)
    LayoutOps.writeZordered(batch2, "x", "y", 3, path, pinned, append = true)

    // meta records the pin
    assert(spark.read.parquet(s"$path/meta").head().getAs[Boolean]("pinned"))

    // the probe sees both batches, exactly, through one stable layout
    val (aLo, aHi, bLo, bHi) = (100L, 260L, 300L, 410L)
    val got = LayoutOps.readZorderBox(spark, path, aLo, aHi, bLo, bHi)
      .select("id").as[Long].collect().toSet
    val expected = mk(0L, 3000L)
      .filter(col("x").between(aLo, aHi) && col("y").between(bLo, bHi))
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)

    // cell assignment is identical across batches: re-laying batch2
    // against the pinned ranges matches what the append wrote
    val relaid = LayoutOps.zorderLayoutPinned(batch2, "x", "y", 3,
      0L, 996L, 0L, 640L)
      .select("id", "zcell").as[(Long, Long)].collect().toMap
    val written = spark.read.parquet(s"$path/data")
      .filter(col("id") >= 1500L)
      .select("id", "zcell").as[(Long, Long)].collect().toMap
    assert(written == relaid)

    // appending without pinned ranges is refused loudly
    val e = intercept[IllegalArgumentException] {
      LayoutOps.writeZordered(batch2, "x", "y", 3, path, None, append = true)
    }
    assert(e.getMessage.contains("pinned"))

    // appending with DIFFERENT geometry than the stored layout is
    // refused loudly — it would silently re-bucket only the new batch
    val e2 = intercept[IllegalArgumentException] {
      LayoutOps.writeZordered(batch2, "x", "y", 3, path,
        Some((0L, 1996L, 0L, 640L)), append = true)
    }
    assert(e2.getMessage.contains("mismatch"))

    // compaction: the two-batch tree folds to ~one file per cell; meta,
    // every row, and the probe answer are untouched
    def parquetFiles: Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/data")).filter(_.getName.endsWith(".parquet"))
    }
    val metaBefore = spark.read.parquet(s"$path/meta").collect().toSeq
    val rowsBefore = spark.read.parquet(s"$path/data")
      .select("id", "x", "y", "zcell").as[(Long, Long, Long, Long)]
      .collect().sorted.toSeq
    val filesBefore = parquetFiles.size
    LayoutOps.compactZordered(spark, path)
    assert(parquetFiles.size < filesBefore,
      s"expected fewer files after compaction, had $filesBefore")
    assert(spark.read.parquet(s"$path/data")
      .select("id", "x", "y", "zcell").as[(Long, Long, Long, Long)]
      .collect().sorted.toSeq == rowsBefore)
    assert(spark.read.parquet(s"$path/meta").collect().toSeq == metaBefore)
    assert(LayoutOps.readZorderBox(spark, path, aLo, aHi, bLo, bHi)
      .select("id").as[Long].collect().toSet == expected)
  }

  test("co-bucketed tables join with NO shuffle on either side, and the " +
    "result equals the unbucketed join") {
    import org.apache.spark.sql.functions._
    val facts = spark.range(20000).select(
      (col("id") % 500).as("k"), (col("id") * 7 % 1000).as("v"))
    val dims = spark.range(500).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    LayoutOps.writeBucketed(facts, "bk_facts", "k", 8)
    LayoutOps.writeBucketed(dims, "bk_dims", "k", 8)
    try {
      val joined = spark.table("bk_facts")
        .join(spark.table("bk_dims"), "k")
      // disable broadcast for the assertion: a 500-row dim would
      // otherwise broadcast and trivially show no exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed equi-join must not shuffle either side:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("MergeJoin"),
          s"expected a merge join over co-numbered buckets:\n$plan")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      val bucketed = joined.groupBy(col("k"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val plain = facts.join(dims, "k").groupBy(col("k"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(bucketed == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }
}
