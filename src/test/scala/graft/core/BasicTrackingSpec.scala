package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The n=1 scalar engine (BookSideBasic / OrderBook1,
  * reference book_side_tracked_basic.rs:44-148) must be state-for-state
  * equivalent to the unified array engine at n=1, including errors; the
  * untracked SimpleBookSide is the brute-force yardstick for both. */
class BasicTrackingSpec extends AnyFunSuite {

  private def snap1(b: BookKernel): Seq[Option[Long]] = {
    val out = new Array[Any](4)
    b.snapshotInto(out, 0)
    out.toSeq.map(v => Option(v).map(_.asInstanceOf[Long]))
  }

  test("scalar n=1 engine == unified engine on random update streams") {
    val rnd = new scala.util.Random(41)
    val scalar = new OrderBook1
    val unified = new OrderBook(1)
    val simple = Map(true -> new SimpleBookSide(true), false -> new SimpleBookSide(false))
    for (step <- 0 until 3000) {
      val isBid = rnd.nextBoolean()
      val price = 1L + rnd.nextInt(20)
      val qty = rnd.nextInt(5).toLong // 0 removes
      Transitions.applyUpdate(scalar, isBid, price, qty)
      Transitions.applyUpdate(unified, isBid, price, qty)
      simple(isBid).setLevel(price, qty)
      assert(snap1(scalar) == snap1(unified), s"step=$step")
      val top = simple(isBid).topLevels(1).headOption
      val off = if (isBid) 0 else 2
      assert(snap1(scalar)(off) == top.map(_._1) &&
        snap1(scalar)(off + 1) == top.map(_._2), s"vs simple, step=$step")
    }
  }

  test("scalar n=1 engine == unified engine on random valid mutation streams") {
    val rnd = new scala.util.Random(43)
    val scalar = new OrderBook1
    val unified = new OrderBook(1)
    val inv = Map(true -> scala.collection.mutable.LongMap[Long](),
      false -> scala.collection.mutable.LongMap[Long]())
    for (step <- 0 until 3000) {
      val isBid = rnd.nextBoolean()
      val levels = inv(isBid)
      val (price, qty) =
        if (levels.nonEmpty && rnd.nextBoolean()) {
          // delete some or all of an existing level
          val ks = levels.keys.toArray
          val p = ks(rnd.nextInt(ks.length))
          val avail = levels(p)
          val d = 1L + rnd.nextLong(avail)
          if (d == avail) levels.remove(p) else levels(p) = avail - d
          (p, -d)
        } else {
          val p = 1L + rnd.nextInt(20).toLong
          val q = 1L + rnd.nextInt(9).toLong
          levels(p) = levels.getOrElse(p, 0L) + q
          (p, q)
        }
      Transitions.applyMutation(scalar, isBid, price, qty)
      Transitions.applyMutation(unified, isBid, price, qty)
      assert(snap1(scalar) == snap1(unified), s"step=$step")
    }
  }

  test("scalar engine raises the same errors as the unified engine") {
    val scalar = new OrderBook1
    val unified = new OrderBook(1)
    scalar.addQty(isBid = true, 10L, 5L)
    unified.addQty(isBid = true, 10L, 5L)
    val e1 = intercept[OrderBookException](scalar.deleteQty(isBid = true, 11L, 1L))
    val e2 = intercept[OrderBookException](unified.deleteQty(isBid = true, 11L, 1L))
    assert(e1.getMessage == e2.getMessage)
    val e3 = intercept[OrderBookException](scalar.deleteQty(isBid = true, 10L, 9L))
    val e4 = intercept[OrderBookException](unified.deleteQty(isBid = true, 10L, 9L))
    assert(e3.getMessage == e4.getMessage)
  }

  test("BookKernel factory picks the scalar engine exactly at n=1") {
    assert(BookKernel(1).isInstanceOf[OrderBook1])
    assert(BookKernel(2).isInstanceOf[OrderBook])
  }
}
