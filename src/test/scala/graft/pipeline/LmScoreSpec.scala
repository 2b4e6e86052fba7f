package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigram LM: hand-computed add-one probabilities, ppm fixed-point") {
    // train slice = ids 0 and 2
    //   doc 0 "a b a b": bigrams (a,b)x2 via... (a,b),(b,a),(a,b)
    //   doc 2 "a b c":   (a,b),(b,c)
    // model: c2(a,b)=3, c2(b,a)=1, c2(b,c)=1; c1(a)=3, c1(b)=2; V=2
    val df = Seq(
      (0L, Some("a b a b")),
      (2L, Some("a b c")),
      (1L, Some("a b x")),
      (3L, Some("z")),
      (4L, Some("x y")),
      (5L, None: Option[String])
    ).toDF("id", "text")
    val out = TextOps.bigramLmScore(df, "text", "id", col("id").isin(0L, 2L))
      .orderBy("id").collect()
    def row(i: Int) = (out(i).getLong(0), out(i).getLong(1),
      out(i).getLong(2), out(i).getLong(3))
    // doc 0: (a,b)=4e6//5=800000 twice, (b,a)=2e6//4=500000
    assert(row(0) == ((0L, 3L, 2100000L, 700000L)))
    // doc 1: (a,b)=800000, (b,x)=(0+1)e6//(2+2)=250000
    assert(row(1) == ((1L, 2L, 1050000L, 525000L)))
    // doc 2: (a,b)=800000, (b,c)=2e6//4=500000
    assert(row(2) == ((2L, 2L, 1300000L, 650000L)))
    // doc 3: single token, no bigrams
    assert(row(3) == ((3L, 0L, 0L, 0L)))
    // doc 4: unknown context x -> uniform floor 1e6//(0+2)=500000
    assert(row(4) == ((4L, 1L, 500000L, 500000L)))
    // doc 5: null text
    assert(row(5) == ((5L, 0L, 0L, 0L)))
  }

  test("train docs score above a shuffled-text doc (the quality signal)") {
    // familiar prose repeated in train; the eval doc reverses token order
    val train = (0 until 20).map(i =>
      (i * 2L, "the quick brown fox jumps over the lazy dog"))
    val eval = Seq((101L, "dog lazy the over jumps fox brown quick the"),
      (103L, "the quick brown fox jumps over the lazy dog"))
    val df = (train ++ eval).toDF("id", "text")
    val out = TextOps.bigramLmScore(df, "text", "id", col("id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(103L) > out(101L),
      s"in-distribution doc must outscore shuffled doc: $out")
    // and the in-distribution eval doc scores exactly like a train doc
    assert(out(103L) == out(0L))
  }

  test("stored model: score-from-artifact == in-memory; append == one-shot") {
    val df = (0 until 30).map { i =>
      (i.toLong, s"tok${i % 5} tok${(i * 3) % 7} tok${i % 5} tok${(i * 2) % 4}")
    }.toDF("id", "text")
    val isTrain = col("id") % 2 === 0
    val mem = TextOps.bigramLmScore(df, "text", "id", isTrain)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft_lm_model").toString
    TextOps.writeLmModel(df.filter(isTrain), "text", "id", dir)
    val stored = TextOps.scoreAgainstStoredLm(spark, dir, df, "text", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stored == mem)

    // append: build from the first half of the train slice, fold in the
    // second half -> must equal the one-shot artifact at a new epoch
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lm_app").toString
    TextOps.writeLmModel(df.filter(isTrain && col("id") < 14), "text", "id", dir2)
    TextOps.appendLmModel(spark, dir2, df.filter(isTrain && col("id") >= 14),
      "text", "id")
    val m2 = TextOps.readLmModelMeta(spark, dir2)
    assert(m2.epoch == 1L)
    val appended = TextOps.scoreAgainstStoredLm(spark, dir2, df, "text", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(appended == mem)

    // a RE-DROPPED slice is an idempotent no-op: counts are value
    // folds with no row identity, so without the covered-docs
    // anti-join the re-drop would double-weight its bigrams (and every
    // score would silently shift)
    TextOps.appendLmModel(spark, dir2, df.filter(isTrain && col("id") >= 14),
      "text", "id")
    assert(TextOps.readLmModelMeta(spark, dir2).c2Rows == m2.c2Rows)
    val redropped = TextOps.scoreAgainstStoredLm(spark, dir2, df, "text", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(redropped == mem,
      "re-appending a folded slice must not move any score")

    // compaction: fewer count files at a NEW epoch, identical scores
    // (the re-drop no-op above committed epoch 2, so compaction is 3)
    TextOps.compactLmModel(spark, dir2, targetFiles = 1)
    val m3 = TextOps.readLmModelMeta(spark, dir2)
    assert(m3.epoch == 3L && m3.v == m2.v && m3.c2Rows == m2.c2Rows)
    val countFiles = new java.io.File(s"$dir2/counts/e3")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(countFiles == 1, s"expected 1 compacted file, got $countFiles")
    val compacted = TextOps.scoreAgainstStoredLm(spark, dir2, df, "text", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(compacted == mem)
  }

  test("stored model loud failures: missing artifact, empty train write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_bad").toString
    val e1 = intercept[IllegalStateException] {
      TextOps.scoreAgainstStoredLm(spark,
        s"$dir/nothing_here", Seq((1L, "a b")).toDF("id", "text"), "text", "id")
    }
    assert(e1.getMessage.contains("no readable meta"))
    val e2 = intercept[Exception] {
      TextOps.writeLmModel(
        Seq((1L, "solo")).toDF("id", "text"), "text", "id", s"$dir/empty")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e2).exists(_.contains("empty train slice")), e2.toString)
  }

  test("empty train slice fails loudly (no model to score against)") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val e = intercept[Exception] {
      TextOps.bigramLmScore(df, "text", "id", lit(false)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("empty train slice")), e.toString)
  }
}
