package graft.sources

import graft.SparkTestSession
import graft.operators.OrderBookOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every driver table reads with its declared schema") {
    val sf = "/root/testdata/sf0.001"
    TableSources.schemas.keys.foreach { t =>
      val df = TableSources.read(spark, sf, t)
      assert(df.count() > 0, t)
      assert(df.schema == TableSources.schemas(t), t)
    }
  }

  for (format <- Seq("orc", "json", "csv", "parquet")) {
    test(s"$format round-trip preserves a derived stream and feeds the replay") {
      val stream = graft.queries.EventStreams
        .bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
      TableSources.write(stream, dir, format)
      val back = TableSources.readBack(spark, dir, format, stream.schema)
      assert(back.count() == 1000)
      val out = OrderBookOps.topNLevelsFromPriceUpdates(
        back, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      // replay over the round-tripped stream matches the direct replay
      val direct = OrderBookOps.topNLevelsFromPriceUpdates(
        stream, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      val a = out.orderBy("product", "seq").collect()
      val b = direct.orderBy("product", "seq").collect()
      assert(a.length == 1000 && a.toSeq == b.toSeq)
    }
  }

  test("partitioned write produces one directory per key") {
    val stream = graft.queries.EventStreams
      .bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    TableSources.write(stream, dir, "parquet", partitionBy = Seq("product"))
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("product="))
    assert(parts.length == 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
  }
}
