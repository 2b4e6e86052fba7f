package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the persisted HLL register index: build → append →
  * estimate-from-storage, with the stored path provably equal to the
  * one-shot estimate (register max is associative), geometry pinned by
  * meta, and the missing-artifact error loud. */
class HllIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"hll_idx_$tag")
    d.toFile.deleteOnExit()
    s"$d/idx"
  }

  test("write -> append -> estimate == one-shot estimate over the union") {
    val day1 = (0 until 800).map(i => ("g1", s"a$i")) ++
      (0 until 300).map(i => ("g2", s"b$i"))
    val day2 = (400 until 1200).map(i => ("g1", s"a$i")) ++ // overlap
      (0 until 500).map(i => ("g2", s"c$i"))
    val dir = tmpDir("roundtrip")
    StatsOps.writeHllIndex(day1.toDF("g", "v"), Seq("g"), col("v"), dir,
      m = 128)
    StatsOps.appendHllIndex(spark, dir, day2.toDF("g", "v"), col("v"))
    val stored = StatsOps.estimateFromStoredHll(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = StatsOps.hllEstimateByGroup(
        (day1 ++ day2).toDF("g", "v"), Seq("g"), col("v"), m = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == oneShot)
    // append committed a NEW epoch and meta points at it
    val meta = StatsOps.readHllIndexMeta(spark, dir)
    assert(meta.epoch == 1L && meta.m == 128 && meta.groupCols == Seq("g"))
    assert(new java.io.File(s"$dir/regs/e0").exists(),
      "old epoch dir must remain immutable on disk")
  }

  test("register relation stays bounded by groups x m across appends") {
    val dir = tmpDir("bounded")
    StatsOps.writeHllIndex(
      (0 until 2000).map(i => ("g", s"x$i")).toDF("g", "v"),
      Seq("g"), col("v"), dir, m = 64)
    StatsOps.appendHllIndex(spark, dir,
      (0 until 3000).map(i => ("g", s"y$i")).toDF("g", "v"), col("v"))
    assert(StatsOps.readHllIndexMeta(spark, dir).regRows <= 64L)
  }

  test("missing artifact fails loudly, not with a Spark read stacktrace") {
    val e = intercept[IllegalStateException] {
      StatsOps.estimateFromStoredHll(spark, tmpDir("missing") + "/nope")
    }
    assert(e.getMessage.contains("no readable meta"))
  }
}
