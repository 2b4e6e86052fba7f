package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Kernels that embed driver-built arrays (bloom bitmaps, minhash
  * permutation tables, PQ codebooks) must compare structurally, not by
  * array reference — otherwise two semantically identical instances
  * never canonicalize equal, and Catalyst skips subexpression
  * elimination / ReuseExchange across them. */
class KernelEqualitySpec extends AnyFunSuite {

  private def longRef: Expression = BoundReference(0, LongType, nullable = true)
  private def strRef: Expression = BoundReference(0, StringType, nullable = true)
  private def vecRef: Expression =
    BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)

  test("BloomMightContain: equal content => equal expression + hash") {
    val mk = () => BloomMightContain(longRef, Array(1L, 2L, 3L), 2, 192)
    assert(mk() == mk())
    assert(mk().hashCode() == mk().hashCode())
    assert(mk().canonicalized == mk().canonicalized)
    assert(mk() != BloomMightContain(longRef, Array(1L, 2L, 4L), 2, 192))
  }

  test("MinhashSig: equal content => equal expression + hash") {
    val mk = () => MinhashSig(strRef, 3, Array(1L, 5L), Array(7L, 11L), 97L)
    assert(mk() == mk())
    assert(mk().hashCode() == mk().hashCode())
    assert(mk().canonicalized == mk().canonicalized)
    assert(mk() != MinhashSig(strRef, 3, Array(1L, 5L), Array(7L, 13L), 97L))
  }

  test("PqEncode: equal content => equal expression + hash") {
    val mk = () => PqEncode(vecRef, Array(1L, 2L, 3L, 4L), Array(5L, 25L), 1, 2, 2)
    assert(mk() == mk())
    assert(mk().hashCode() == mk().hashCode())
    assert(mk().canonicalized == mk().canonicalized)
    assert(mk() != PqEncode(vecRef, Array(1L, 2L, 3L, 5L), Array(5L, 26L), 1, 2, 2))
  }
}
