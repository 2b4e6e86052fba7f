package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** De-skew contract for the LM scoring join: the probe side is
  * pre-aggregated to one row per (doc, bigram) with its in-doc
  * multiplicity, so a document repeating one stopword bigram thousands
  * of times contributes ONE row to the (ctx, big)-keyed join instead of
  * thousands — the within-doc half of the funnel is gone structurally;
  * the residual cross-doc half is bounded by doc count per key and
  * rides AQE's skew-join split (documented at the call site). */
class LmSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stopwordCorpus = {
    // every doc is the same token repeated: ONE distinct bigram in the
    // whole corpus, appearing (tokens-1) times per doc — the worst case
    // for a (ctx, big)-keyed join
    (0L until 50L).map(i => (i, Seq.fill(40)("the").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("scores stay exact under a single-bigram corpus (weighted fold)") {
    val out = TextOps.bigramLmScore(stopwordCorpus, "text", "doc_id",
        lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // c2 = 50 docs x 39 pairs = 1950, c1 = 1950, V = 1 ->
    // term = (1950+1)*1000000 / (1950+1) = 1000000; 39 bigrams per doc
    assert(out == (0L until 50L).map(i => (i, 39L, 1000000L)).toSet)
  }

  test("join probe side is the per-(doc,bigram) aggregate, not raw pairs") {
    val plan = TextOps.bigramLmScore(stopwordCorpus, "text", "doc_id",
      lit(true)).queryExecution.optimizedPlan
    // the optimized plan must carry an Aggregate grouped by exactly
    // (id, ctx, big) BELOW a join — the structural witness that raw
    // token-pair rows never reach the skewed (ctx, big) key
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val preAgg = plan.collect {
      case a: Aggregate if a.groupingExpressions.size == 3 &&
        a.groupingExpressions.exists(_.toString.contains("__ctx")) &&
        a.groupingExpressions.exists(_.toString.contains("__big")) => a
    }
    assert(preAgg.nonEmpty,
      "per-(doc,bigram) pre-aggregation missing from the optimized plan")
  }

  test("stored-model scoring shares the de-skew (same pre-aggregate)") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("lm_skew")
      d.toFile.deleteOnExit(); s"$d/model"
    }
    TextOps.writeLmModel(stopwordCorpus, "text", "doc_id", dir)
    val q = TextOps.scoreAgainstStoredLm(spark, dir, stopwordCorpus,
      "text", "doc_id")
    val preAgg = q.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.size == 3 &&
        a.groupingExpressions.exists(_.toString.contains("__big")) => a
    }
    assert(preAgg.nonEmpty)
    val rows = q.collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(rows == Set((39L, 1000000L)))
  }
}
