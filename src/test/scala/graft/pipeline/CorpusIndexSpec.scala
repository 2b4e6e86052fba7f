package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the corpus-audit operators: inverted index (df / tf /
  * capped postings) and the cross-source overlap matrix. */
class CorpusIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("inverted index: exact df/tf, postings capped to smallest ids") {
    val docs = Seq(
      (10L, "alpha beta alpha"),
      (3L, "alpha gamma"),
      (7L, "alpha beta"),
      (1L, "delta")).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "text", "doc_id", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    // alpha: df=3 (docs 3,7,10), tf=4 (two in doc 10), postings capped to [3,7]
    assert(idx("alpha") == ((3L, 4L, Seq(3L, 7L))))
    assert(idx("beta") == ((2L, 2L, Seq(7L, 10L))))
    assert(idx("gamma") == ((1L, 1L, Seq(3L))))
    assert(idx("delta") == ((1L, 1L, Seq(1L))))
  }

  test("inverted index: minDf prunes the tail") {
    val docs = Seq((1L, "common rare"), (2L, "common")).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "text", "doc_id", 4, minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(idx == Set("common"))
  }

  test("source overlap: pair counts of shared contents, never a self-pair") {
    val docs = Seq(
      (1L, "shared one", "a"), (2L, "shared one", "b"), (3L, "shared one", "c"),
      (4L, "shared two", "a"), (5L, "shared two", "b"),
      (6L, "only in a", "a"), (7L, "only in b", "b")).toDF("doc_id", "text", "source")
    val got = DedupOps.sourceOverlap(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "shared one" is in all three sources, "shared two" in a+b
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    assert(got.keys.forall { case (x, y) => x < y }) // i<j, no self/dup pairs
  }

  test("source overlap: empty when nothing is shared") {
    val docs = Seq((1L, "x", "a"), (2L, "y", "b")).toDF("doc_id", "text", "source")
    assert(DedupOps.sourceOverlap(docs, "text", "source").count() == 0L)
  }
}
