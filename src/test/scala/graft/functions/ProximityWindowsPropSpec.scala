package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property over the [[ProximityWindows]] kernel: the
  * sorted two-pointer sweep with stamp-array distinct counting must
  * equal a brute-force reimplementation of the window contract (for
  * every distinct anchor position o, all m distinct tokens occur in
  * [o, o + w − 1]) on arbitrary occurrence lists — duplicates,
  * unsorted input, tokens beyond m, any w. Pure JVM, no Spark
  * session. */
class ProximityWindowsPropSpec extends AnyFunSuite {

  private def brute(occ: Seq[(Long, String)], m: Long, w: Int): Long = {
    val anchors = occ.map(_._1).distinct
    anchors.count { o =>
      occ.filter(p => p._1 >= o && p._1 <= o + (w - 1))
        .map(_._2).distinct.size.toLong == m
    }.toLong
  }

  private def toArrayData(occ: Seq[(Long, String)]): GenericArrayData =
    new GenericArrayData(occ.map { case (p, t) =>
      InternalRow(p, UTF8String.fromString(t))
    }.toArray[Any])

  test("kernel ≡ brute force on arbitrary occurrence lists") {
    val genOcc = for {
      n <- Gen.choose(0, 60)
      toks <- Gen.choose(1, 6)
      occ <- Gen.listOfN(n, for {
        pos <- Gen.choose(1L, 40L)
        t <- Gen.choose(0, toks - 1).map(i => s"t$i")
      } yield (pos, t))
    } yield occ
    val p = Prop.forAll(genOcc, Gen.choose(1L, 7L),
        Gen.choose(1, 10)) { (occ, m, w) =>
      ProximityWindows.compute(toArrayData(occ), m, w) ==
        brute(occ, m, w)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"kernel/brute divergence: $res")
  }
}
