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
}
