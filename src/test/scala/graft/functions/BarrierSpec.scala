package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The repo-owned optimizer barrier ([[NondetBarrier]]) — identity
  * semantics, and the pin contract it exists for: a wrapped predicate
  * stays at its FilterExec site instead of being pushed into a parquet
  * scan or folded away. */
class BarrierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pin is the identity on values, including nulls") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null),
      (3L, "c")).toDF("id", "s")
    val got = df.select(col("id"), Barrier.pin(col("s")).as("s2"),
        Barrier.pin(col("id") * 2).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got === Seq((1L, "a", 2L), (2L, null, 4L), (3L, "c", 6L)))
  }

  test("pinned predicate filters identically to the bare predicate") {
    val df = spark.range(1000L).select(col("id"),
      (col("id") % 7).as("m"))
    val bare = df.filter(col("m") === 3).count()
    val pinned = df.filter(Barrier.pin(col("m") === 3)).count()
    assert(pinned === bare)
  }

  test("pinned predicate is not pushed into a parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("barrier_push")
      .toString + "/t"
    spark.range(100L).select(col("id"), (col("id") % 5).as("m"))
      .write.mode("overwrite").parquet(dir)
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
    // the bare predicate reaches the scan's data filters (sanity: the
    // pushdown machinery is live for this shape)...
    val bare = spark.read.parquet(dir).filter(col("m") === 3)
    assert(scanOf(bare).dataFilters.nonEmpty)
    // ...the pinned one must not
    val pinned = spark.read.parquet(dir).filter(Barrier.pin(col("m") === 3))
    assert(scanOf(pinned).dataFilters.isEmpty,
      "barrier failed to keep the predicate out of the scan")
    assert(pinned.count() === 20L)
  }

  test("barrier is not constant-folded even over a literal child") {
    // a foldable child would let ConstantFolding collapse the filter;
    // the barrier must keep a FilterExec in the plan
    val df = spark.range(10L).filter(Barrier.pin(lit(true)))
    val filters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.nonEmpty, "barrier over a literal was folded away")
    assert(df.count() === 10L)
  }

  test("barrier survives whole-stage codegen with child semantics") {
    // run a codegen-heavy shape through it: values must match the
    // unpinned twin bit for bit
    val df = spark.range(10000L)
      .select(col("id"), xxhash64(col("id")).as("h"))
    val a = df.filter(col("h") % 3 === 0).agg(sum(col("id"))).collect()(0)
    val b = df.filter(Barrier.pin(col("h") % 3 === 0))
      .agg(sum(col("id"))).collect()(0)
    assert(a === b)
  }
}
