package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained NB quality classifier: one-shot scores against an
  * independent plain-Scala reimplementation of the scoring contract,
  * stored-model ≡ one-shot, prior-only docs, null handling, and the
  * loud empty-train guards. */
class ClassifierOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_nb_$tag").toString

  private val Dim = 64

  /** The polyHash % dim bucket of a token — mirrors
    * [[graft.functions.StringPolyHash]] (acc·31 + byte, mod 1e9+7). */
  private def bucket(tok: String): Int =
    (tok.getBytes("UTF-8").foldLeft(0L)((a, b) =>
      (a * 31 + (b & 0xff)) % 1000000007L) % Dim).toInt

  /** Independent brute-force NB: counts, fixed-point terms, priors,
    * argmax — plain loops, no Spark. */
  private def brute(rows: Seq[(Long, String, Option[Boolean])],
                    trainIds: Set[Long])
      : Map[Long, (Long, Long, Boolean)] = {
    val train = rows.filter(r => trainIds(r._1) && r._3.isDefined)
    def toks(t: String): Seq[String] =
      if (t == null) Nil else t.split(" ", -1).toSeq.filter(_.nonEmpty)
    val nPos = train.count(_._3.get)
    val nNeg = train.count(!_._3.get)
    val cnt = scala.collection.mutable.Map
      .empty[(Int, Boolean), Long].withDefaultValue(0L)
    train.foreach { case (_, t, Some(l)) =>
      toks(t).foreach(w => cnt((bucket(w), l)) += 1L)
    }
    val tPos = cnt.collect { case ((_, true), n) => n }.sum
    val tNeg = cnt.collect { case ((_, false), n) => n }.sum
    val n = nPos + nNeg
    rows.map { case (id, t, _) =>
      val sp = 1000000L * nPos / n + toks(t).map(w =>
        (cnt((bucket(w), true)) + 1L) * 1000000L / (tPos + Dim)).sum
      val sn = 1000000L * nNeg / n + toks(t).map(w =>
        (cnt((bucket(w), false)) + 1L) * 1000000L / (tNeg + Dim)).sum
      id -> ((sp, sn, sp >= sn))
    }.toMap
  }

  private val rows: Seq[(Long, String, Option[Boolean])] = Seq(
    (0L, "good words appear here good words", Some(true)),
    (2L, "more good words and good prose", Some(true)),
    (4L, "spam junk junk spam zz", Some(false)),
    (6L, "zz junk spam zz zz", Some(false)),
    (8L, "a doc with a null label", None),     // trains neither class
    (1L, "good words in a held out doc", None),
    (3L, "junk spam zz", None),
    (5L, "", None),                            // featureless: prior only
    (7L, null.asInstanceOf[String], None))     // null text: prior only

  private def df = rows.map { case (id, t, l) =>
    (id, t, l.map(java.lang.Boolean.valueOf).orNull)
  }.toDF("doc_id", "text", "lab")

  private def collectScores(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("score_pos_micro"), r.getAs[Long]("score_neg_micro"),
        r.getAs[Boolean]("predicted")))).toMap

  test("one-shot scores, priors, and argmax equal the brute oracle; " +
    "every input row emits (featureless and null-text docs score " +
    "prior-only); null-label rows train neither class") {
    val got = collectScores(ClassifierOps.nbQualityScore(df, "text",
      "doc_id", "lab", col("doc_id") % 2 === 0, Dim))
    val want = brute(rows, rows.map(_._1).filter(_ % 2 == 0).toSet)
    assert(got == want, s"got $got\nwant $want")
    assert(got.contains(5L) && got.contains(7L), "prior-only rows emit")
    assert(got(5L)._1 == got(7L)._1, "featureless docs score the prior")
    // the classifier separates the planted classes on held-out docs
    assert(got(1L)._3 && !got(3L)._3, s"separation: $got")
  }

  test("stored model ≡ one-shot: counts from the artifact, totals from " +
    "the meta row, no training text read at probe time") {
    val dir = tmp("store") + "/nb"
    ClassifierOps.writeNbModel(df.filter(col("doc_id") % 2 === 0),
      "text", "doc_id", "lab", dir, Dim)
    val meta = ClassifierOps.readNbModelMeta(spark, dir)
    assert(meta.dim == Dim && meta.nPos == 2L && meta.nNeg == 2L)
    val oneShot = collectScores(ClassifierOps.nbQualityScore(df, "text",
      "doc_id", "lab", col("doc_id") % 2 === 0, Dim))
    val stored = collectScores(ClassifierOps.scoreAgainstStoredNb(spark,
      dir, df.drop("lab"), "text", "doc_id"))
    assert(stored == oneShot)
  }

  test("empty train slice refuses loudly: the write guard at train " +
    "time, the in-plan guard at one-shot score time") {
    val e = intercept[IllegalArgumentException] {
      ClassifierOps.writeNbModel(df.filter(col("doc_id") > 100),
        "text", "doc_id", "lab", tmp("empty") + "/nb", Dim)
    }
    assert(e.getMessage.contains("empty train slice"))
    val e2 = intercept[Exception] {
      ClassifierOps.nbQualityScore(df, "text", "doc_id", "lab",
        col("doc_id") > 100, Dim).collect()
    }
    assert(e2.getMessage != null &&
      e2.getMessage.contains("empty train slice"), s"got ${e2.getMessage}")
  }
}
