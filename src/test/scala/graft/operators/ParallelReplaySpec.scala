package graft.operators

import graft.SparkTestSession
import graft.queries.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parallel-prefix replay must be bit-identical to the serial fold. */
class ParallelReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def proj(n: Int) = Seq("product", "seq") ++ OrderBookOps.bboFieldNames(n)

  for (mutation <- Seq(false, true); segments <- Seq(1, 4, 7)) {
    test(s"parallel(segments=$segments) == serial, mutation=$mutation, derived events") {
      val stream = EventStreams.bookStream(
        spark, "/root/testdata/sf0.001", qtyZeroEvery5 = !mutation)
      val serial =
        if (mutation) OrderBookOps.topNLevelsFromPriceMutations(
          stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
        else OrderBookOps.topNLevelsFromPriceUpdates(
          stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
      val parallel =
        if (mutation) ParallelReplay.topNLevelsFromPriceMutationsParallel(
          stream, "price", "qty", "is_bid", 2, "product", "seq", segments)
        else ParallelReplay.topNLevelsFromPriceUpdatesParallel(
          stream, "price", "qty", "is_bid", 2, "product", "seq", segments)
      val a = serial.select(proj(2).map(col): _*).orderBy("product", "seq").collect()
      val b = parallel.select(proj(2).map(col): _*).orderBy("product", "seq").collect()
      assert(a.length == 1000 && b.length == 1000)
      a.zip(b).foreach { case (x, y) => assert(x == y) }
    }
  }

  test("auto-segmentation picks sane widths and stays bit-identical") {
    val stream = EventStreams.bookStream(
      spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    // shallow many-product stream at the default threshold: don't split
    assert(ParallelReplay.chooseSegments(stream, "product") == 1)
    // forced-low threshold: follows the max-depth formula on the data
    val cores = spark.sparkContext.defaultParallelism
    val maxd = stream.groupBy("product").count()
      .agg(max("count")).head().getLong(0)
    def expected(minRows: Long, deepest: Long, n: Long): Int = {
      val target = math.max(minRows, math.ceil(n.toDouble / cores).toLong)
      math.max(1L, math.ceil(deepest.toDouble / target).toLong).toInt
    }
    val forced = ParallelReplay.chooseSegments(stream, "product",
      minRowsPerSegment = 10L)
    assert(forced == expected(10L, maxd, 1000L))
    // single-product: splits into ~cores pieces
    val single = stream.withColumn("product", lit(0L))
    assert(ParallelReplay.chooseSegments(single, "product",
      minRowsPerSegment = 100L) == expected(100L, 1000L, 1000L))
    // ONE deep product hidden among shallow ones must still split —
    // the heuristic keys off the deepest product, not the average
    val mixed = stream.withColumn("product",
      when(col("seq") % 5 =!= 0, lit(0L)).otherwise(col("product") + 1))
    val mixedMaxd = mixed.groupBy("product").count()
      .agg(max("count")).head().getLong(0)
    val mixedSegs = ParallelReplay.chooseSegments(mixed, "product",
      minRowsPerSegment = 10L)
    assert(mixedSegs == expected(10L, mixedMaxd, 1000L) && mixedSegs > 1)
    // auto variant == serial, bit-identical
    val serial = OrderBookOps.topNLevelsFromPriceUpdates(
      stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
    val auto = ParallelReplay.topNLevelsFromPriceUpdatesParallelAuto(
      stream, "price", "qty", "is_bid", 2, "product", "seq",
      minRowsPerSegment = 25L)
    val a = serial.select(proj(2).map(col): _*).orderBy("product", "seq").collect()
    val b = auto.select(proj(2).map(col): _*).orderBy("product", "seq").collect()
    assert(a.length == 1000 && b.length == 1000)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("parallel replay with a tiny product (fewer events than segments)") {
    val df = Seq(
      ("X", 0L, 5L, 3L, true),
      ("X", 1L, 6L, 2L, true),
      ("Y", 0L, 9L, 1L, false))
      .toDF("product", "seq", "price", "qty", "is_bid")
    val out = ParallelReplay.topNLevelsFromPriceUpdatesParallel(
        df, "price", "qty", "is_bid", 1, "product", "seq", segments = 8)
      .orderBy("product", "seq").collect()
    assert(out.length == 3)
    assert(out(1).getLong(5) == 6L) // X seq1: best bid 6
    assert(out(2).getLong(7) == 9L) // Y: best ask 9
  }

  test("over-delete still fails in parallel mode (error not masked)") {
    val df = Seq(
      ("X", 0L, 5L, 3L, true),
      ("X", 1L, 5L, -9L, true)) // over-delete in segment 1
      .toDF("product", "seq", "price", "qty", "is_bid")
    val out = ParallelReplay.topNLevelsFromPriceMutationsParallel(
      df, "price", "qty", "is_bid", 1, "product", "seq", segments = 2)
    val e = intercept[org.apache.spark.SparkException] { out.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("Qty exceeds available"))))
  }

  test("parallel O3 modify == serial on random valid modify streams") {
    val rnd = new scala.util.Random(99)
    val rows = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Boolean, Option[Long], Option[Long])]()
    for (product <- Seq("A", "B")) {
      val orders = Map(true -> scala.collection.mutable.ArrayBuffer[(Long, Long)](),
        false -> scala.collection.mutable.ArrayBuffer[(Long, Long)]())
      var seq = 0L
      for (_ <- 0 until 400) {
        val isBid = rnd.nextBoolean()
        val os = orders(isBid)
        rnd.nextInt(4) match {
          case 1 if os.nonEmpty =>
            val i = rnd.nextInt(os.size); val (p0, q0) = os(i)
            val p1 = 1L + rnd.nextInt(15); val q1 = 1L + rnd.nextInt(9)
            rows += ((product, seq, p1, q1, isBid, Some(p0), Some(q0)))
            os(i) = (p1, q1)
          case 2 if os.nonEmpty =>
            val i = rnd.nextInt(os.size); val (p0, q0) = os.remove(i)
            rows += ((product, seq, p0, 0L, isBid, Some(p0), Some(q0)))
          case _ =>
            val p = 1L + rnd.nextInt(15); val q = 1L + rnd.nextInt(9)
            rows += ((product, seq, p, q, isBid, None, None))
            os += ((p, q))
        }
        seq += 1
      }
    }
    val df = rows.toSeq.toDF("product", "seq", "price", "qty", "is_bid", "prev_price", "prev_qty")
    val serial = OrderBookOps.topNLevelsFromPriceMutationsWithModify(
      df, "price", "qty", "is_bid", "prev_price", "prev_qty", 3,
      Seq("product"), Seq("seq"))
    val parallel = ParallelReplay.topNLevelsFromPriceMutationsWithModifyParallel(
      df, "price", "qty", "is_bid", "prev_price", "prev_qty", 3,
      "product", "seq", segments = 5)
    val cols = (Seq("product", "seq") ++ OrderBookOps.bboFieldNames(3)).map(col)
    val a = serial.select(cols: _*).orderBy("product", "seq").collect()
    val b = parallel.select(cols: _*).orderBy("product", "seq").collect()
    assert(a.length == 800 && b.length == 800)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
