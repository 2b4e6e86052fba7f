package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs the `bench = true` queries from the Registry
  * against SPARK_GRAFT_SF_DIR and prints one JSON line. A warmup pass on
  * the smallest table amortizes JVM/codegen startup out of the timings. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JIT + codegen + parquet footer caches — including the
    // replay exec at n=1 (scalar engine) and n=2 (unified engine) on a
    // tiny synthetic stream, so the first timed query measures steady
    // state instead of absorbing kernel JIT (round 1 showed
    // bbo_updates_n1 ~2× its steady-state time for exactly this reason).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    locally {
      import org.apache.spark.sql.functions._
      val ev = spark.range(20000).select(
        col("id").as("seq"), (col("id") % 4).as("product"),
        (col("id") % 2 === 0).as("is_bid"),
        (col("id") % 37 + 1).as("price"), (col("id") % 9 + 1).as("qty"))
      graft.operators.OrderBookOps.topNLevelsFromPriceUpdates(
        ev, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq")).count()
      graft.operators.OrderBookOps.topNLevelsFromPriceUpdates(
        ev, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq")).count()
    }

    val benchSet = Registry.all.filter(_.bench)
    val results = benchSet.map { q =>
      val t0 = System.nanoTime()
      val n = try q.run(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      q.name -> (secs, n)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, -1L)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
