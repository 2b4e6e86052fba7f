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

  test("larger m stays estimator-grade (m-derived rho width)") {
    // regression for the fixed-23-bit-stream bug: with WBits pinned at
    // 23, any m > 64 left the top bits of w permanently zero and the
    // estimate overshot ~2x (m=256) to ~32x (m=4096). With the
    // m-derived width the error must stay in the sketch's normal band
    // (~1.04/sqrt(m) relative; 3 sigma at m=256 ~ 20%).
    val rows = (0 until 4000).map(i => ("g", s"val$i"))
    for (m <- Seq(128, 256, 1024, 4096)) {
      val est = StatsOps.hllEstimateByGroup(
        rows.toDF("g", "v"), Seq("g"), col("v"), m)
        .collect()(0).getLong(1)
      val errPermille = math.abs(est - 4000L) * 1000 / 4000
      assert(errPermille < 400,
        s"m=$m est=$est err_permille=$errPermille — register width regression")
    }
  }

  test("estimate-only output matches the eval wrapper's n_est column") {
    val rows = (0 until 3000).map(i => ("a", s"q$i")) ++
      (0 until 700).map(i => ("b", s"r$i"))
    val df = rows.toDF("g", "v")
    val full = StatsOps.hllDistinctByGroup(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val only = StatsOps.hllEstimateByGroup(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full == only)
  }

  test("register relations union-merge: append == one-shot") {
    val a = (0 until 1000).map(i => ("g", s"u$i")).toDF("g", "v")
    val b = (500 until 1500).map(i => ("g", s"u$i")).toDF("g", "v")
    val whole = (0 until 1500).map(i => ("g", s"u$i")).toDF("g", "v")
    val merged = StatsOps.hllEstimateFromRegisters(
      StatsOps.hllRegisters(a, Seq("g"), col("v"))
        .union(StatsOps.hllRegisters(b, Seq("g"), col("v"))), Seq("g"))
      .collect()(0).getLong(1)
    val oneShot = StatsOps.hllEstimateByGroup(whole, Seq("g"), col("v"))
      .collect()(0).getLong(1)
    assert(merged == oneShot)
  }

  test("estimating registers built at a larger m fails loudly") {
    val regs = StatsOps.hllRegisters(
      (0 until 2000).map(i => ("g", s"mm$i")).toDF("g", "v"),
      Seq("g"), col("v"), m = 128)
    val e = intercept[Exception] {
      StatsOps.hllEstimateFromRegisters(regs, Seq("g")).collect() // m=64
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains(">= m = 64")),
      s"expected the geometry guard, got: ${msgs(e).take(3)}")
  }

  test("small-range: linear counting holds planted low cardinalities " +
    "inside its published error band; the raw branch is untouched above") {
    // Linear counting at load n/m <= ~1.5 has relative std error
    // sqrt(m(e^t - t - 1))/n (t = n/m): ~8% at n=20, ~5% at n=100,
    // m=64. Assert a 3-sigma-ish band — far tighter than the raw
    // estimator's documented under-bias in this regime.
    for (n <- Seq(5, 20, 60, 100)) {
      val est = StatsOps.hllEstimateByGroup(
        (0 until n).map(i => ("g", s"lc$i")).toDF("g", "v"),
        Seq("g"), col("v"), m = 64)
        .collect()(0).getLong(1)
      val errPermille = math.abs(est - n.toLong) * 1000 / n
      assert(errPermille <= 250,
        s"n=$n est=$est err_permille=$errPermille — outside the " +
          "linear-counting band")
    }
    // above the 2.5m cutoff the estimate must be the RAW formula,
    // byte-identical to what the estimator always produced: recompute
    // it from the register relation by hand and compare
    val big = (0 until 2000).map(i => ("g", s"v$i")).toDF("g", "v")
    val m = 64
    val regs = StatsOps.hllRegisters(big, Seq("g"), col("v"), m)
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    val wBits = 63 - java.lang.Long.numberOfLeadingZeros(
      graft.functions.StringPolyHash.Mod / m)
    val scale = 1L << (wBits + 1)
    val s2 = regs.map { case (_, mj) => 1L << (wBits + 1 - mj).toInt }.sum +
      (m - regs.length) * scale
    val raw = 709L * m * m * scale / (s2 * 1000L)
    val est = StatsOps.hllEstimateByGroup(big, Seq("g"), col("v"), m)
      .collect()(0).getLong(1)
    assert(est == raw, s"raw branch changed: est=$est hand-raw=$raw")
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
