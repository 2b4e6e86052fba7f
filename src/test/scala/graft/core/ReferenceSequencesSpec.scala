package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's cross-implementation integration sequences
  * (order_book/tests/order_book.rs:6-101 and
  * order_book/tests/book_side_tests.rs:142-248) against the Scala book. */
class ReferenceSequencesSpec extends AnyFunSuite {

  for (isBid <- Seq(true, false)) {
    test(s"add_qty accumulates on one level (order_book.rs:6-26), isBid=$isBid") {
      val book = new OrderBook(5)
      var cur = 0L
      (0 until 10).foreach { _ =>
        cur += 10
        book.addQty(isBid, 100L, 10L)
        val side = if (isBid) book.bids else book.asks
        assert(side.levelQty(100L).contains(cur))
      }
    }

    test(s"cancel order empties the level (order_book.rs:28-46), isBid=$isBid") {
      val book = new OrderBook(5)
      book.addQty(isBid, 100L, 10L)
      val side = if (isBid) book.bids else book.asks
      assert(side.levelQty(100L).contains(10L))
      book.deleteQty(isBid, 100L, 10L)
      assert(side.levelCount == 0 && side.topPrice(0).isEmpty)
    }

    test(s"modify_qty resize cycle (order_book.rs:48-76), isBid=$isBid") {
      val book = new OrderBook(5)
      val side = if (isBid) book.bids else book.asks
      book.addQty(isBid, 100L, 10L)
      assert(side.levelQty(100L).contains(10L))
      book.modifyQty(isBid, 100L, 10L, 100L, 20L)
      assert(side.levelQty(100L).contains(20L))
      book.addQty(isBid, 100L, 10L)
      assert(side.levelQty(100L).contains(30L))
      book.modifyQty(isBid, 100L, 30L, 100L, 20L)
      assert(side.levelQty(100L).contains(20L))
    }

    test(s"modify_price moves the level (order_book.rs:78-101), isBid=$isBid") {
      val book = new OrderBook(5)
      val side = if (isBid) book.bids else book.asks
      book.addQty(isBid, 100L, 10L)
      book.modifyQty(isBid, 100L, 10L, 101L, 20L)
      assert(side.levelQty(100L).isEmpty && side.levelQty(101L).contains(20L))
      book.modifyQty(isBid, 101L, 20L, 100L, 10L)
      assert(side.levelQty(101L).isEmpty && side.levelQty(100L).contains(10L))
    }
  }

  test("nth-best golden drain sequence (book_side_tests.rs:142-248)") {
    // orders (1,100) (2,100) (3,101) (4,98); track all 4 with n=5
    def mk(isBid: Boolean): BookSide = {
      val s = new BookSide(isBid, 5)
      Seq((1L, 100L), (2L, 100L), (3L, 101L), (4L, 98L))
        .foreach { case (p, q) => s.addQty(p, q) }
      s
    }
    val bid = mk(isBid = true)
    val ask = mk(isBid = false)
    val bidSorted = Seq((4L, 98L), (3L, 101L), (2L, 100L), (1L, 100L))
    val askSorted = bidSorted.reverse
    bidSorted.indices.foreach { i =>
      assert(bid.topPrice(i).contains(bidSorted(i)._1) && bid.topQty(i).contains(bidSorted(i)._2))
      assert(ask.topPrice(i).contains(askSorted(i)._1) && ask.topQty(i).contains(askSorted(i)._2))
    }
    assert(bid.topPrice(4).isEmpty && ask.topPrice(4).isEmpty)

    bid.deleteQty(3L, 101L); ask.deleteQty(3L, 101L)
    val afterDel3 = Seq((4L, 98L), (2L, 100L), (1L, 100L))
    afterDel3.indices.foreach { i =>
      assert(bid.topPrice(i).contains(afterDel3(i)._1) && bid.topQty(i).contains(afterDel3(i)._2))
      assert(ask.topPrice(2 - i).contains(afterDel3(i)._1) && ask.topQty(2 - i).contains(afterDel3(i)._2))
    }
    assert(bid.topPrice(3).isEmpty && ask.topPrice(3).isEmpty)

    bid.deleteQty(1L, 100L); ask.deleteQty(1L, 100L)
    val afterDel1 = Seq((4L, 98L), (2L, 100L))
    afterDel1.indices.foreach { i =>
      assert(bid.topPrice(i).contains(afterDel1(i)._1))
      assert(ask.topPrice(1 - i).contains(afterDel1(i)._1))
    }

    bid.deleteQty(4L, 98L); ask.deleteQty(4L, 98L)
    assert(bid.topPrice(0).contains(2L) && bid.topQty(0).contains(100L))
    assert(ask.topPrice(0).contains(2L) && ask.topQty(0).contains(100L))
    assert(bid.topPrice(1).isEmpty && ask.topPrice(1).isEmpty)

    bid.deleteQty(2L, 100L); ask.deleteQty(2L, 100L)
    assert(bid.topPrice(0).isEmpty && ask.topPrice(0).isEmpty)
  }
}
