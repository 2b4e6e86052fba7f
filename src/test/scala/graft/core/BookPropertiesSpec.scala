package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** ScalaCheck property tests over the pure-JVM book kernels — the
  * randomized invariants SURVEY §5 calls out as cheap wins the
  * reference lacks: tracked top-N ≡ brute-force rescan on arbitrary
  * event streams, add⁻¹ = delete, O3-with-null-prevs ≡ O2, and the
  * bid/ask key-negation mirror. Pure JVM (no Spark session) — hundreds
  * of generated streams run in milliseconds. */
class BookPropertiesSpec extends AnyFunSuite {

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name failed: $res")
  }

  /** Brute-force top-N of one side from a model map: bids best→worst =
    * price desc; asks best→worst = price asc. */
  private def bruteTop(model: mutable.Map[(Boolean, Long), Long],
                       isBid: Boolean, n: Int): Seq[(Long, Long)] = {
    val lv = model.collect { case ((b, p), q) if b == isBid => (p, q) }.toSeq
    val sorted = if (isBid) lv.sortBy(-_._1) else lv.sortBy(_._1)
    sorted.take(n)
  }

  /** Read the kernel snapshot back as (bids, asks) top lists. */
  private def snap(book: BookKernel, n: Int): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val out = new Array[Any](4 * n)
    book.snapshotInto(out, 0)
    def side(off: Int) = (0 until n).flatMap { i =>
      Option(out(off + i)).map(p =>
        (p.asInstanceOf[Long], out(off + n + i).asInstanceOf[Long]))
    }
    (side(0), side(2 * n))
  }

  private val genUpdate: Gen[(Boolean, Long, Long)] = for {
    isBid <- Gen.oneOf(true, false)
    price <- Gen.chooseNum(1L, 15L)
    qty <- Gen.chooseNum(0L, 5L) // 0 = remove the level (O1 semantics)
  } yield (isBid, price, qty)

  test("property: tracked top-N equals brute-force rescan on random update streams") {
    for (n <- Seq(1, 2, 3, 5)) {
      checkProp(s"topN-brute n=$n", Prop.forAll(Gen.listOfN(120, genUpdate)) { evs =>
        val book = BookKernel(n)
        val model = mutable.Map.empty[(Boolean, Long), Long]
        evs.forall { case (isBid, p, q) =>
          Transitions.applyUpdate(book, isBid, p, q)
          if (q == 0) model.remove((isBid, p)) else model((isBid, p)) = q
          val (bids, asks) = snap(book, n)
          bids == bruteTop(model, isBid = true, n) &&
            asks == bruteTop(model, isBid = false, n)
        }
      })
    }
  }

  /** Valid mutation streams: deletes are clamped to the available qty in
    * a running model, so the stream never triggers the (separately
    * spec'd) error paths. */
  private val genRawMut: Gen[(Boolean, Long, Long)] = for {
    isBid <- Gen.oneOf(true, false)
    price <- Gen.chooseNum(1L, 12L)
    qty <- Gen.chooseNum(-6L, 6L)
  } yield (isBid, price, qty)

  private def validMutations(raw: List[(Boolean, Long, Long)]): List[(Boolean, Long, Long)] = {
    val model = mutable.Map.empty[(Boolean, Long), Long]
    raw.map { case (isBid, p, q) =>
      val have = model.getOrElse((isBid, p), 0L)
      val adj = if (q >= 0) q else -(math.min(-q, have)) // clamp over-deletes
      val nq = have + adj
      if (nq == 0) model.remove((isBid, p)) else model((isBid, p)) = nq
      (isBid, p, adj)
    }
  }

  test("property: mutation streams match brute force; full drain empties the book") {
    for (n <- Seq(1, 2, 4)) {
      checkProp(s"mutations n=$n", Prop.forAll(Gen.listOfN(100, genRawMut)) { raw =>
        val evs = validMutations(raw)
        val book = BookKernel(n)
        val model = mutable.Map.empty[(Boolean, Long), Long]
        val stepOk = evs.forall { case (isBid, p, q) =>
          Transitions.applyMutation(book, isBid, p, q)
          val nq = model.getOrElse((isBid, p), 0L) + q
          if (nq == 0) model.remove((isBid, p)) else model((isBid, p)) = nq
          val (bids, asks) = snap(book, n)
          bids == bruteTop(model, isBid = true, n) &&
            asks == bruteTop(model, isBid = false, n)
        }
        // add⁻¹ = delete: drain every remaining level; book must be empty
        model.toSeq.foreach { case ((isBid, p), q) =>
          Transitions.applyMutation(book, isBid, p, -q)
        }
        val (b2, a2) = snap(book, n)
        stepOk && b2.isEmpty && a2.isEmpty
      })
    }
  }

  test("property: O3 with null prevs is O2 on any valid mutation stream") {
    for (n <- Seq(1, 3)) {
      checkProp(s"o3-null-prev n=$n", Prop.forAll(Gen.listOfN(80, genRawMut)) { raw =>
        val evs = validMutations(raw)
        val b2 = BookKernel(n)
        val b3 = BookKernel(n)
        evs.forall { case (isBid, p, q) =>
          Transitions.applyMutation(b2, isBid, p, q)
          Transitions.applyMutationWithModify(b3, isBid, p, q,
            hasPrevPrice = false, prevPrice = 0L,
            hasPrevQty = false, prevQty = 0L)
          snap(b2, n) == snap(b3, n)
        }
      })
    }
  }

  /** Valid O3 modify streams: a driver walks a model book and emits a
    * random mix of the modify table's legal rows — plain adds, full
    * modifies (move/resize via prev_price+prev_qty), qty-only modifies
    * (prev_qty set, prev_price null, qty = prev_qty − delete), and
    * deletes-via-modify (qty = 0 with prevs). Each op is validated
    * against the model so the error branches (spec'd separately) never
    * fire. */
  private case class ModifyEv(isBid: Boolean, price: Long, qty: Long,
                              hasPrevPrice: Boolean, prevPrice: Long,
                              hasPrevQty: Boolean, prevQty: Long)

  private def genModifyStream(len: Int): Gen[List[ModifyEv]] = {
    val opPick = Gen.chooseNum(0, 3)
    def step(model: mutable.Map[(Boolean, Long), Long],
             isBid: Boolean, price: Long, qty: Long, op: Int): ModifyEv = {
      val sideLevels = model.keys.filter(_._1 == isBid).toSeq.sortBy(_._2)
      if (op == 0 || sideLevels.isEmpty) {
        // plain add (qty > 0, no prevs)
        val q = math.max(1L, qty)
        model((isBid, price)) = model.getOrElse((isBid, price), 0L) + q
        ModifyEv(isBid, price, q, hasPrevPrice = false, 0L, hasPrevQty = false, 0L)
      } else {
        val (_, lp) = sideLevels((price % sideLevels.size).toInt.abs)
        val have = model((isBid, lp))
        op match {
          case 1 => // full modify: move the whole level to `price` with qty q
            val q = math.max(1L, qty)
            model.remove((isBid, lp))
            model((isBid, price)) = model.getOrElse((isBid, price), 0L) + q
            ModifyEv(isBid, price, q, hasPrevPrice = true, lp, hasPrevQty = true, have)
          case 2 => // qty-only modify DOWN at lp: qty>0, prev_qty=have, deletes have-qty
            val q = math.max(1L, math.min(qty, have))
            if (q == have) // no-op delete of 0 is invalid; treat as plain add instead
              return step(model, isBid, price, qty, 0)
            model((isBid, lp)) = q
            ModifyEv(isBid, lp, q, hasPrevPrice = false, 0L, hasPrevQty = true, have)
          case _ => // delete the level via modify (qty == 0, prevs set)
            model.remove((isBid, lp))
            ModifyEv(isBid, lp, 0L, hasPrevPrice = true, lp, hasPrevQty = true, have)
        }
      }
    }
    Gen.listOfN(len, for {
      isBid <- Gen.oneOf(true, false)
      price <- Gen.chooseNum(1L, 12L)
      qty <- Gen.chooseNum(1L, 6L)
      op <- opPick
    } yield (isBid, price, qty, op)).map { raws =>
      val model = mutable.Map.empty[(Boolean, Long), Long]
      raws.map { case (isBid, p, q, op) => step(model, isBid, p, q, op) }
    }
  }

  test("property: random valid O3 modify streams match brute force at every step") {
    for (n <- Seq(1, 2, 4)) {
      checkProp(s"o3-modify n=$n", Prop.forAll(genModifyStream(80)) { evs =>
        val book = BookKernel(n)
        val model = mutable.Map.empty[(Boolean, Long), Long]
        evs.forall { ev =>
          Transitions.applyMutationWithModify(book, ev.isBid, ev.price, ev.qty,
            ev.hasPrevPrice, ev.prevPrice, ev.hasPrevQty, ev.prevQty)
          // replay the same semantics on the model
          if (ev.qty > 0 && ev.hasPrevQty && ev.hasPrevPrice) {
            val moved = model((ev.isBid, ev.prevPrice)) - ev.prevQty
            if (moved == 0) model.remove((ev.isBid, ev.prevPrice))
            else model((ev.isBid, ev.prevPrice)) = moved
            model((ev.isBid, ev.price)) = model.getOrElse((ev.isBid, ev.price), 0L) + ev.qty
          } else if (ev.qty > 0 && ev.hasPrevQty) {
            val left = model((ev.isBid, ev.price)) - (ev.prevQty - ev.qty)
            if (left == 0) model.remove((ev.isBid, ev.price))
            else model((ev.isBid, ev.price)) = left
          } else if (ev.qty > 0) {
            model((ev.isBid, ev.price)) = model.getOrElse((ev.isBid, ev.price), 0L) + ev.qty
          } else if (ev.hasPrevQty) {
            val at = if (ev.hasPrevPrice) ev.prevPrice else ev.price
            val left = model((ev.isBid, at)) - ev.prevQty
            if (left == 0) model.remove((ev.isBid, at))
            else model((ev.isBid, at)) = left
          }
          val (bids, asks) = snap(book, n)
          bids == bruteTop(model, isBid = true, n) &&
            asks == bruteTop(model, isBid = false, n)
        }
      })
    }
  }

  test("property: bid/ask mirror — negated prices on the other side track the same book") {
    for (n <- Seq(2, 5)) {
      checkProp(s"mirror n=$n", Prop.forAll(Gen.listOfN(100, genUpdate)) { evs =>
        val fwd = BookKernel(n)
        val mir = BookKernel(n)
        evs.forall { case (isBid, p, q) =>
          Transitions.applyUpdate(fwd, isBid, p, q)
          Transitions.applyUpdate(mir, !isBid, -p, q)
          val (fb, fa) = snap(fwd, n)
          val (mb, ma) = snap(mir, n)
          // mirrored book: its asks at -p are the forward book's bids
          fb == ma.map { case (p2, q2) => (-p2, q2) } &&
            fa == mb.map { case (p2, q2) => (-p2, q2) }
        }
      })
    }
  }
}
