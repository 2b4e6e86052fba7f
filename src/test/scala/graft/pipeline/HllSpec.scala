package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("estimate lands within ~3 sigma of exact in the honest regime") {
    // m=64 -> relative error ~1.04/8 = 13%; 3 sigma ~ 40%
    val rows =
      (0 until 2000).map(i => ("g1", s"v$i")) ++
      (0 until 5000).flatMap(i => Seq(("g2", s"w$i"), ("g2", s"w$i"))) ++ // dups don't count
      (0 until 1500).map(i => ("g3", s"x$i"))
    val out = StatsOps.hllDistinctByGroup(rows.toDF("g", "v"), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("g1")._1 == 2000L && out("g2")._1 == 5000L && out("g3")._1 == 1500L)
    out.foreach { case (g, (_, _, err)) =>
      assert(err < 400L, s"group $g err_permille=$err exceeds the 3-sigma band")
    }
  }

  test("deterministic: identical value sets give identical estimates; nulls drop") {
    val rows = (0 until 1000).flatMap(i =>
      Seq(("a", s"t$i"), ("b", s"t$i"))) ++ Seq(("a", null), ("b", null))
    val out = StatsOps.hllDistinctByGroup(
        rows.toDF("g", "v"), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == out("b"))
    assert(out("a")._1 == 1000L)
  }

  test("contract: m must be a power of two in range") {
    val df = Seq(("a", "x")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      StatsOps.hllDistinctByGroup(df, Seq("g"), col("v"), m = 48)
    }
    intercept[IllegalArgumentException] {
      StatsOps.hllDistinctByGroup(df, Seq("g"), col("v"), m = 16)
    }
  }
}
