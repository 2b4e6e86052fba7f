package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BookAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (product, seq, bid_px, bid_qty, ask_px, ask_qty) — NULLs via Option
  private def bbo(rows: Seq[(Long, Long, Option[Long], Option[Long], Option[Long], Option[Long])]) =
    rows.toDF("product", "seq", "bid_price_1", "bid_qty_1", "ask_price_1", "ask_qty_1")

  test("microprice: hand-computed values, floor division, NULL one-sided") {
    val out = BookAnalytics.microprice(bbo(Seq(
      (1L, 10L, Some(100L), Some(3L), Some(104L), Some(1L)),
      (1L, 11L, Some(100L), Some(3L), None, None),      // one-sided: NULLs
      (1L, 12L, None, None, Some(104L), Some(1L)))))
      .orderBy("seq").collect()
    // seq=10: spread 4; imbalance 3000/4=750; micro (100*1+104*3)*1e6/4 = 103_000_000
    assert(out(0).getLong(2) == 4L)
    assert(out(0).getLong(3) == 750L)
    assert(out(0).getLong(4) == 103000000L)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("twa spread: last event carries no weight; one-sided gaps excluded") {
    // product 1: quotes at seq 0 (spread 2, dt 5), seq 5 (one-sided, dt 5),
    // seq 10 (spread 4, dt 3), seq 13 (last, no dt)
    val out = BookAnalytics.timeWeightedSpread(bbo(Seq(
      (1L, 0L, Some(10L), Some(1L), Some(12L), Some(1L)),
      (1L, 5L, Some(10L), Some(1L), None, None),
      (1L, 10L, Some(10L), Some(1L), Some(14L), Some(1L)),
      (1L, 13L, Some(10L), Some(1L), Some(11L), Some(1L)),
      (2L, 0L, Some(5L), Some(1L), None, None)))) // never two-sided
      .orderBy("product").collect()
    val p1 = out(0)
    assert(p1.getLong(1) == 4L) // n_events
    assert(p1.getLong(2) == 2L) // n_quoted (seq 0 and 10; 13 has no dt)
    assert(p1.getLong(3) == 8L) // quoted_ticks = 5 + 3
    // area = 2*5 + 4*3 = 22 → 22000/8 = 2750
    assert(p1.getLong(4) == 2750L)
    val p2 = out(1)
    assert(p2.getLong(1) == 1L && p2.getLong(2) == 0L)
    assert(p2.isNullAt(3) && p2.isNullAt(4))
  }

  test("OFI: Cont-Kukanov-Stoikov sign conventions, NULL sides contribute 0") {
    val out = BookAnalytics.orderFlowImbalance(bbo(Seq(
      // n=0: no predecessor → 0
      (1L, 0L, Some(100L), Some(5L), Some(104L), Some(7L)),
      // n=1: bid improves (101>100): +qb=6; ask unchanged (104=104):
      //   -qa=-8 +pqa=+7 → net bid 6, ask -1 → 5
      (1L, 1L, Some(101L), Some(6L), Some(104L), Some(8L)),
      // n=2: bid drops (99<101): -pqb=-6; ask improves down (103<104):
      //   -qa=-2 → -8
      (1L, 2L, Some(99L), Some(4L), Some(103L), Some(2L)),
      // n=3: bid side empty now → bid 0; ask backs off (105>103): +pqa=+2
      (1L, 3L, None, None, Some(105L), Some(9L)),
      // n=4: bid reappears (prev NULL) → bid 0; ask unchanged:
      //   -qa +pqa = -1+9 = 8... ask same price 105, qa=1: -1+9=8
      (1L, 4L, Some(98L), Some(3L), Some(105L), Some(1L)))))
      .orderBy("seq").collect()
    val ofi = out.map(_.getLong(2)).toSeq
    assert(ofi == Seq(0L, 5L, -8L, 2L, 8L))
    val cum = out.map(_.getLong(3)).toSeq
    assert(cum == Seq(0L, 5L, -3L, -1L, 7L))
  }

  test("depth imbalance: absent levels count 0; empty book yields NULL, not div0") {
    val df = Seq(
      (1L, 1L, Some(5L), Some(2L), Some(7L), Some(3L)),   // 7 vs 10
      (1L, 2L, Some(5L), Some(2L), None, None),           // 2 vs 0 -> 1000
      (1L, 3L, None, None, None, None))                   // empty -> NULL
      .toDF("product", "seq", "bid_qty_1", "bid_qty_2", "ask_qty_1", "ask_qty_2")
    val out = BookAnalytics.depthImbalance(df, 2).orderBy("seq").collect()
    assert(out(0).getLong(2) == 7L && out(0).getLong(3) == 10L)
    assert(out(0).getLong(4) == 7000L / 17L)
    assert(out(1).getLong(4) == 1000L)
    assert(out(2).getLong(2) == 0L && out(2).isNullAt(4))
  }

  test("realized variance: exact doubled-mid squares, one-sided gaps break the chain") {
    val df = bbo(Seq(
      (1L, 1L, Some(100L), Some(1L), Some(104L), Some(1L)), // 2mid 204
      (1L, 2L, Some(101L), Some(1L), Some(105L), Some(1L)), // 206: d=2
      (1L, 3L, Some(99L), Some(1L), None, None),            // one-sided, skipped
      (1L, 4L, Some(98L), Some(1L), Some(104L), Some(1L)),  // 202: d=-4 vs 206
      (2L, 9L, Some(50L), Some(1L), Some(52L), Some(1L))))  // single quote
    val out = BookAnalytics.realizedVariance(df).orderBy("product").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(out(0).getLong(3) == 4L + 16L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 0L &&
      out(1).getLong(3) == 0L)
  }

  test("randomized frames: all three analytics match a plain-Scala reimplementation") {
    val rnd = new scala.util.Random(43)
    val rows: Seq[(Long, Long, Option[Long], Option[Long], Option[Long], Option[Long])] =
      (0 until 400).map { i =>
        def side() = if (rnd.nextInt(5) == 0) (None, None)
          else (Some(90L + rnd.nextInt(20)), Some(1L + rnd.nextInt(50)))
        val (bp, bq) = side(); val (ap, aq) = side()
        (rnd.nextInt(3).toLong, i.toLong, bp, bq, ap, aq)
      }
    val df = bbo(rows)

    // microprice
    val micro = BookAnalytics.microprice(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3), r.getLong(4))))).toMap
    rows.foreach { case (p, s, bp, bq, ap, aq) =>
      val expect = for (b <- bp; qb <- bq; a <- ap; qa <- aq)
        yield (a - b, qb * 1000 / (qb + qa), (b * qa + a * qb) * 1000000L / (qb + qa))
      assert(micro((p, s)) == expect, s"micro p=$p s=$s")
    }

    // OFI vs per-product fold
    val ofi = BookAnalytics.orderFlowImbalance(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (p, evs) =>
      var cum = 0L
      var prev: Option[(Option[Long], Option[Long], Option[Long], Option[Long])] = None
      evs.sortBy(_._2).foreach { case (_, s, bp, bq, ap, aq) =>
        val e = prev match {
          case None => 0L
          case Some((pbp, pbq, pap, paq)) =>
            val bid = (for (b <- bp; pb <- pbp) yield
              (if (b >= pb) bq.get else 0L) - (if (b <= pb) pbq.get else 0L)).getOrElse(0L)
            val ask = (for (a <- ap; pa <- pap) yield
              -(if (a <= pa) aq.get else 0L) + (if (a >= pa) paq.get else 0L)).getOrElse(0L)
            bid + ask
        }
        cum += e
        assert(ofi((p, s)) == ((e, cum)), s"ofi p=$p s=$s")
        prev = Some((bp, bq, ap, aq))
      }
    }

    // TWA spread vs per-product fold
    val twa = BookAnalytics.timeWeightedSpread(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    rows.groupBy(_._1).foreach { case (p, evs) =>
      val sorted = evs.sortBy(_._2)
      val withDt = sorted.zip(sorted.drop(1).map(e => Some(e._2)) :+ None)
        .map { case ((_, s, bp, _, ap, _), nxt) =>
          (for (b <- bp; a <- ap) yield a - b, nxt.map(_ - s)) }
      val quoted = withDt.collect { case (Some(sp), Some(dt)) => (sp, dt) }
      val ticks = quoted.map(_._2).sum
      val area = quoted.map { case (sp, dt) => sp * dt }.sum
      val expect = (sorted.size.toLong, quoted.size.toLong,
        if (quoted.isEmpty) None else Some(ticks),
        if (quoted.isEmpty) None else Some(area * 1000 / ticks))
      assert(twa(p) == expect, s"twa p=$p")
    }
  }

  test("microprice is stateless map-only: runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Long, Long)]
    val sdf = mem.toDF.toDF("product", "seq",
      "bid_price_1", "bid_qty_1", "ask_price_1", "ask_qty_1")
    val out = BookAnalytics.microprice(sdf)
    val q = out.writeStream.format("memory").queryName("micro_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 100L, 3L, 104L, 1L)); q.processAllAvailable()
    } finally q.stop()
    val r = spark.table("micro_stream").collect()(0)
    assert(r.getLong(2) == 4L && r.getLong(3) == 750L && r.getLong(4) == 103000000L)
  }

  test("analytics compose on the sf0.001 replay: row counts line up") {
    val sfDir = "/root/testdata/sf0.001"
    val frame = graft.queries.BookQueries.bboUpdates(spark, sfDir, 1)
    val n = frame.count()
    assert(BookAnalytics.microprice(frame).count() == n)
    assert(BookAnalytics.orderFlowImbalance(frame).count() == n)
    val twa = BookAnalytics.timeWeightedSpread(frame).collect()
    assert(twa.length == 8) // 8 products
    assert(twa.forall(r => r.getLong(1) > 0))
  }
}
