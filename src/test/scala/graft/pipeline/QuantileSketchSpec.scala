package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable quantile sketch: bounded bucket relation, guaranteed
  * relative error, exact small-value region, and the HLL-style
  * union-merge property. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 5
  private val perms = Seq(100, 500, 900, 990)

  test("value_lb under-reports the exact quantile by < 2^-subBits " +
    "relative, never over") {
    val rows = (0 until 20000).map(i =>
      ("g", (i.toLong * i * 37 + 1000) % 50000000L))
    val df = rows.toDF("g", "v")
    val exact = StatsOps.exactQuantilesByGroup(df, Seq("g"), col("v"), perms)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val sk = StatsOps.sketchQuantilesByGroup(df, Seq("g"), col("v"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    perms.foreach { p =>
      val e = exact(p.toLong); val s = sk(p.toLong)
      assert(s <= e, s"p=$p sketch $s must not exceed exact $e")
      assert(e - s < math.max(e >> S, 1L) + (1L << S),
        s"p=$p sketch $s vs exact $e — outside the 2^-$S band")
    }
  }

  test("values below 2^subBits are EXACT — sketch == exact quantiles") {
    val rows = (0 until 5000).map(i => ("g", (i * 13 % 32).toLong))
    val df = rows.toDF("g", "v")
    val exact = StatsOps.exactQuantilesByGroup(df, Seq("g"), col("v"), perms)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val sk = StatsOps.sketchQuantilesByGroup(df, Seq("g"), col("v"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sk == exact)
  }

  test("sketches union-merge: day1 ∪ day2 == one-shot over both") {
    val day1 = (0 until 4000).map(i => ("g", (i.toLong * 97 + 5) % 1000000L))
    val day2 = (0 until 6000).map(i => ("g", (i.toLong * 31 + 7) % 800000L))
    val merged = StatsOps.quantilesFromSketch(
        StatsOps.quantileSketch(day1.toDF("g", "v"), Seq("g"), col("v"), S)
          .union(StatsOps.quantileSketch(day2.toDF("g", "v"), Seq("g"),
            col("v"), S)),
        Seq("g"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val oneShot = StatsOps.sketchQuantilesByGroup(
        (day1 ++ day2).toDF("g", "v"), Seq("g"), col("v"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(merged == oneShot)
  }

  test("sketch relation stays bounded; negatives and nulls drop") {
    val rows = (0 until 100000).map(i =>
      ("g", (i.toLong * 2654435761L) % (1L << 40)))
    val sk = StatsOps.quantileSketch(rows.toDF("g", "v"), Seq("g"), col("v"), S)
    val n = sk.count()
    assert(n <= (64 - S).toLong * (1L << S) + (1L << S),
      s"bucket relation has $n rows — unbounded?")
    val withBad = rows.toDF("g", "v")
      .union(Seq(("g", -5L)).toDF("g", "v"))
      .union(Seq(("g", null.asInstanceOf[java.lang.Long])).toDF("g", "v"))
    val skBad = StatsOps.quantileSketch(withBad, Seq("g"), col("v"), S)
    assert(skBad.agg(sum(col("__qs_n"))).collect()(0).getLong(0) == 100000L)
  }

  test("persisted index: write -> append -> quantiles == one-shot; " +
    "epoch GC keeps the grace pair; missing artifact fails loudly") {
    val day1 = (0 until 3000).map(i => ("g", (i.toLong * 97 + 5) % 700000L))
    val day2 = (0 until 2000).map(i => ("g", (i.toLong * 31 + 7) % 900000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_qs_idx").toString
    StatsOps.writeQuantileIndex(day1.toDF("g", "v"), Seq("g"), col("v"),
      s"$dir/idx", subBits = S)
    StatsOps.appendQuantileIndex(spark, s"$dir/idx",
      day2.toDF("g", "v"), col("v"))
    StatsOps.appendQuantileIndex(spark, s"$dir/idx",
      day1.take(500).toDF("g", "v"), col("v"))
    val stored = StatsOps.quantilesFromStoredSketch(spark, s"$dir/idx", perms)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val oneShot = StatsOps.sketchQuantilesByGroup(
        (day1 ++ day2 ++ day1.take(500)).toDF("g", "v"), Seq("g"),
        col("v"), perms, S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(stored == oneShot)
    val meta = StatsOps.readQuantileIndexMeta(spark, s"$dir/idx")
    assert(meta.epoch == 2L && meta.subBits == S && meta.groupCols == Seq("g"))
    // shared epoch GC: exactly {superseded, current} on disk
    val epochs = Option(new java.io.File(s"$dir/idx/buckets").listFiles())
      .toSeq.flatten.map(_.getName)
      .filter(n => n.startsWith("e") && n.drop(1).forall(_.isDigit)).toSet
    assert(epochs == Set("e1", "e2"))
    val e = intercept[IllegalStateException] {
      StatsOps.quantilesFromStoredSketch(spark, s"$dir/nope", perms)
    }
    assert(e.getMessage.contains("no readable meta"))
  }

  test("bucket arithmetic matches a JVM reference across the full " +
    "non-negative long range (boundaries, huge values)") {
    def refBucket(v: Long, s: Int): Long =
      if (v < (1L << s)) v
      else {
        val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
        val shift = msb - s
        (msb - s + 1).toLong * (1L << s) + ((v >>> shift) & ((1L << s) - 1))
      }
    val values = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 1023L, 1024L,
      (1L << 20) - 1, 1L << 20, (1L << 40) + 12345L, (1L << 62) - 1,
      1L << 62, Long.MaxValue) ++
      (0 until 50).map(i => math.abs(i * 2654435761L * 97 + 13))
    val df = values.map(v => ("g", v)).toDF("g", "v")
    val got = StatsOps.quantileSketch(df, Seq("g"), col("v"), S)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val exp = values.groupBy(refBucket(_, S)).view.mapValues(_.size.toLong).toMap
    assert(got == exp, s"bucket mismatch: ${got.toSeq.sorted.take(5)} vs " +
      s"${exp.toSeq.sorted.take(5)}")
  }

  test("contract: subBits bounds; clashing group columns are refused") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      StatsOps.quantileSketch(df, Seq("g"), col("v"), subBits = 0)
    }
    intercept[IllegalArgumentException] {
      StatsOps.quantileSketch(df, Seq("g"), col("v"), subBits = 17)
    }
    // a group column named like an output/internal column would be
    // silently clobbered by the withColumn chain — refused loudly
    val clash = Seq(("g", 1L)).toDF("q_permille", "v")
    intercept[IllegalArgumentException] {
      StatsOps.sketchQuantilesByGroup(clash, Seq("q_permille"), col("v"),
        perms, S)
    }
  }
}
