package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenShingleHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Mod = 1000000007L

  /** Naive reference: split on single spaces (keeping empties), byte-fold
    * each token, combine each k-window with the same fold over hashes. */
  private def ref(text: String, k: Int): Seq[Long] = {
    val toks = text.split(" ", -1).toSeq
    def th(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % Mod)
    if (toks.length < k) Seq.empty
    else toks.map(th).sliding(k).map(_.foldLeft(0L)((a, h) => (a * 31 + h) % Mod)).toSeq
  }

  test("matches the naive reference on random texts") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "")
    val texts = (0 until 100).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }
    for (k <- Seq(1, 2, 3, 5)) {
      val got = texts.toDF("t")
        .select(TokenShingleHash.shingleHashes(col("t"), k).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      texts.zip(got).foreach { case (t, g) =>
        assert(g == ref(t, k), s"k=$k text='$t'")
      }
    }
  }

  test("edge cases: empty text, short texts, consecutive spaces") {
    val got = Seq("", "one", "one two", "a  b c", "  ")
      .toDF("t")
      .select(TokenShingleHash.shingleHashes(col("t"), 3).as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got(0).isEmpty)  // "" -> 1 token < 3
    assert(got(1).isEmpty)  // 1 token
    assert(got(2).isEmpty)  // 2 tokens
    assert(got(3) == ref("a  b c", 3)) // 4 tokens (one empty) -> 2 shingles
    assert(got(4) == ref("  ", 3))     // 3 empty tokens -> 1 shingle of zeros
    assert(got(4) == Seq(0L))
  }

  test("interpreted eval matches codegen") {
    val e = TokenShingleHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c d")), 3)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.toLongArray().toSeq == ref("a b c d", 3))
  }
}
