package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the corpus-audit operators: inverted index (df / tf /
  * capped postings) and the cross-source overlap matrix. */
class CorpusIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Collect the scalar-row index back into token -> (df, tf, postings)
    * for assertion convenience; postings ordered by post_rank. */
  private def asMap(idx: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, Seq[Long])] =
    idx.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (tok, rows) =>
        val sorted = rows.sortBy(_._4)
        assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq,
          s"post_rank not dense 1..k for $tok")
        tok -> ((sorted.head._2, sorted.head._3, sorted.map(_._5).toSeq))
      }

  test("inverted index: exact df/tf, postings capped to smallest ids") {
    val docs = Seq(
      (10L, "alpha beta alpha"),
      (3L, "alpha gamma"),
      (7L, "alpha beta"),
      (1L, "delta")).toDF("doc_id", "text")
    val idx = asMap(TextOps.invertedIndex(docs, "text", "doc_id", maxPostings = 2))
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

  test("inverted index: stopword in every doc stays capped, no window in plan") {
    // the skew shape: one token ("the") present in all 200 docs — under
    // the old row_number() window this put every row in ONE task's sort;
    // the min-K aggregate keeps k-slot state and partial-aggregates
    val docs = (1L to 200L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, "text", "doc_id", maxPostings = 3)
    val idx = asMap(out)
    assert(idx("the") == ((200L, 200L, Seq(1L, 2L, 3L))))
    assert(idx("w42") == ((1L, 1L, Seq(42L))))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"),
      s"inverted index must not plan a WindowExec:\n$physical")
  }

  test("ngram familiarity: exact counts, permilles, and short-doc zeros") {
    // 2-grams: doc 1 "a b a b" -> [ab, ba, ab]; doc 2 "a b c" ->
    // [ab, bc]; doc 3 "x" -> too short; doc 4 "q r" -> [qr]
    // corpus counts: ab=3, ba=1, bc=1, qr=1
    val df = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "x"), (4L, "q r")
    ).toDF("doc_id", "text")
    val got = TextOps.ngramFamiliarity(df, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      // doc 1: n=3, tot=3+1+3=7 -> 7000/3=2333; unique: ba -> 1000/3=333
      (1L, 3L, 2333L, 333L),
      // doc 2: n=2, tot=3+1=4 -> 2000; unique: bc -> 500
      (2L, 2L, 2000L, 500L),
      (3L, 0L, 0L, 0L),
      // doc 4: n=1, tot=1 -> 1000; unique -> 1000
      (4L, 1L, 1000L, 1000L)))
  }

  test("ngram familiarity plan: no window, partial-aggregated rollup") {
    val df = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = TextOps.ngramFamiliarity(df, "text", "doc_id", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }

  test("LongMinK: heap keeps k smallest across merges, skips nulls") {
    val vals = Seq[java.lang.Long](9L, 1L, null, 7L, 3L, 5L, 3L, 8L, 2L)
      .zipWithIndex.map { case (v, i) => (i % 4, v) } // 4 groups force merges
      .toDF("g", "v")
    val got = vals.repartition(8).groupBy(col("g"))
      .agg(graft.functions.LongMinK.minK(col("v"), 2).as("mk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    // groups: g0 -> (9,3,2), g1 -> (1,5), g2 -> (null,3), g3 -> (7,8)
    assert(got == Map(0 -> List(2L, 3L), 1 -> List(1L, 5L),
      2 -> List(3L), 3 -> List(7L, 8L)))
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
