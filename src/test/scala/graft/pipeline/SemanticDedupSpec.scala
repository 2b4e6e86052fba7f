package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup (cluster → representative → τ-cosine verdict): hand-built
  * clusters pin representative selection and the exact-integer τ
  * boundary; a brute-force Scala oracle checks the full verdict table
  * on random vectors; and the plan must stay window- and
  * self-join-free (the linear-per-cluster scale claim). */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two orthogonal "clusters": x-axis-ish ids 0-2, y-axis-ish ids 10-11.
  // scaled() multiplies by 1000, so these integer floats stay exact.
  private def handDf = Seq(
    (0L, Array(1.0f, 0.0f)),   // cos to (1,0) = 1.0
    (1L, Array(0.8f, 0.6f)),   // cos to (1,0) = 0.8
    (2L, Array(0.6f, 0.8f)),   // cos to (1,0) = 0.6 — nearer cent 0 than cent 1? 0.6 vs 0.8 → cent 1
    (10L, Array(0.0f, 1.0f)),  // cos to (0,1) = 1.0
    (11L, Array(-0.6f, 0.8f))  // cos to (0,1) = 0.8
  ).toDF("vec_id", "embedding")

  private def handCents = Seq(
    (0L, Seq(1000L, 0L)),
    (1L, Seq(0L, 1000L))
  ).toDF("cent_id", "cent_v")

  test("representative = most central member; verdicts at tau=0.7") {
    val out = SimilarityOps.semanticDedup(handDf, "vec_id", "embedding",
      handCents, tauPermille = 700)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    // cell 0 = {0, 1}, rep 0 (ccos 1.0 beats 0.8); cos(0,1)=0.8 ≥ 0.7 → dup
    // cell 1 = {2, 10, 11}, rep 10 (ccos 1.0); cos(10,2)=0.8 → dup,
    //   cos(10,11)=0.8 → dup
    assert(out == Seq(
      (0L, 0L, 0L, false),
      (1L, 0L, 0L, true),
      (2L, 1L, 10L, true),
      (10L, 1L, 10L, false),
      (11L, 1L, 10L, true)))
  }

  test("tau boundary is exact: cos(m, rep) == tau flags as dup") {
    // rep (5,0): ccos to centroid (1,0) is 1.0; member (3,4): cos to rep
    // = 15/(5·5) = 0.6 EXACTLY. τ=600 must flag it (≥), τ=601 must not.
    val df = Seq(
      (0L, Array(5.0f, 0.0f)),
      (1L, Array(3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1000L, 0L))).toDF("cent_id", "cent_v")
    def dupOf1(tau: Int) = SimilarityOps.semanticDedup(df, "vec_id",
        "embedding", cents, tau)
      .filter(col("vec_id") === 1L).head().getBoolean(3)
    assert(dupOf1(600))
    assert(!dupOf1(601))
  }

  test("zero and null vectors are excluded; negative-dot members kept") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(-1.0f, 0.0f)), // cos to rep = -1 → dot ≤ 0 → never dup
      (2L, Array(0.0f, 0.0f)),  // zero vector: excluded
      (3L, null.asInstanceOf[Array[Float]]) // null: excluded
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1000L, 0L))).toDF("cent_id", "cent_v")
    val out = SimilarityOps.semanticDedup(df, "vec_id", "embedding",
      cents, 0) // τ=0: any positive-dot non-rep member is a dup
    val rows = out.collect().map(r => (r.getLong(0), r.getBoolean(3))).sorted.toSeq
    assert(rows == Seq((0L, false), (1L, false)))
  }

  test("matches a brute-force oracle on random vectors") {
    val rnd = new scala.util.Random(37)
    val data = (0L until 400L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val df = data.toDF("vec_id", "embedding")
    val cents = SimilarityOps.kmeansCentroids(df, "vec_id", "embedding",
      k = 5, iters = 2)
    val tau = 300

    val centRows = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    def sc(v: Array[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toSeq
    def idot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Long], b: Seq[Long]): Double =
      idot(a, b).toDouble / (math.sqrt(idot(a, a).toDouble) * math.sqrt(idot(b, b).toDouble))
    // assignment: max cosine to centroid, ties to lower cent_id
    val assigned = data.map { case (id, v) =>
      val s = sc(v)
      val cell = centRows.map { case (cid, cv) => (-cos(s, cv), cid) }.min._2
      (id, s, cell)
    }
    val expect = assigned.groupBy(_._3).toSeq.flatMap { case (cell, ms) =>
      val cv = centRows.find(_._1 == cell).get._2
      val rep = ms.map { case (id, s, _) => ((-cos(s, cv), id), (id, s)) }
        .minBy(_._1)._2
      ms.map { case (id, s, _) =>
        val d = idot(s, rep._2)
        val dup = id != rep._1 && d > 0 &&
          BigInt(d) * BigInt(d) * 1000000 >=
            BigInt(tau.toLong * tau) * idot(s, s) * idot(rep._2, rep._2)
        (id, cell, rep._1, dup)
      }
    }.sortBy(_._1)

    val got = SimilarityOps.semanticDedup(df, "vec_id", "embedding", cents, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got == expect)
  }

  test("embedding outliers: bottom decile per cell, quantile ties stay in") {
    // one cell at (1,0); vectors (1, i/10) have ccos strictly decreasing
    // in i AND distinct at permille resolution (1000, 995, 980, ...,
    // 485, 465). n=20, p=100 -> rank ceil(100*20/1000)=2 -> cut =
    // 2nd-smallest ccos (i=18); strictly below -> only i=19 flagged.
    val df = (0 until 20).map(i => (i.toLong, Array(1.0f, i / 10.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1000L, 0L))).toDF("cent_id", "cent_v")
    val out = SimilarityOps.embeddingOutliers(df, "vec_id", "embedding",
        cents, 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(out.size == 20)
    assert(out.filter(_._2).map(_._1) == Seq(19L))
  }

  test("embedding outliers refuse zero-norm centroids") {
    val df = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(0L, 0L))).toDF("cent_id", "cent_v")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.embeddingOutliers(df, "vec_id", "embedding", cents, 100)
    }
    assert(e.getMessage.contains("zero-norm centroid"))
  }

  test("plan is window-free and self-join-free (linear per cluster)") {
    val df = (0L until 50L).map(i => (i, Array.fill(4)(i.toFloat / 50)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(250L, 250L, 250L, 250L))).toDF("cent_id", "cent_v")
    val plan = SimilarityOps.semanticDedup(df, "vec_id", "embedding", cents, 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // both joins (centroids in, reps back) broadcast
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, plan)
  }
}
