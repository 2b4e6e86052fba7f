package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The pigeonhole warning's two audiences, pinned apart: user-facing
  * capped pair generation must WARN loudly when the cap is about to
  * drop most bucketed rows (that silence would be a silently-empty
  * result), while the recall harnesses — which pin the over-cap regime
  * on purpose to measure the cap's price — mute it via
  * `expectedDegenerate` so the benchmark tail does not train operators
  * to ignore the real warning. The flag mutes ONLY the warning; the
  * cap semantics (and thus the measured counts) are identical. */
class CapWarnMuteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** All vectors share one direction → one bucket holds everything →
    * any cap below n drops 100% of bucketed rows: the exact regime the
    * warning exists for. */
  private def coneCorpus(n: Int) =
    (0 until n).map(i => (i.toLong, Array.fill(8)(1.0f + (i % 3) * 1e-4f)))
      .toDF("vec_id", "embedding")

  test("user-facing capped pair generation still warns in the degenerate regime") {
    val (_, err) = graft.SpecSupport.capturingErr {
      SimilarityOps.cosineNearDupPairs(coneCorpus(40), "vec_id", "embedding",
        threshold = 0.9, planes = 4, maxBucketFreq = 2).count()
    }
    assert(err.contains("cosineNearDupPairs(planes=4)") &&
      err.contains("pigeonhole"))
  }

  test("expectedDegenerate mutes the warning without changing the kept pairs") {
    val ((muted, loud), err) = graft.SpecSupport.capturingErr {
      val m = SimilarityOps.cosineNearDupPairs(coneCorpus(40), "vec_id",
        "embedding", threshold = 0.9, planes = 4, maxBucketFreq = 2,
        expectedDegenerate = true).count()
      val l = SimilarityOps.cosineNearDupPairs(coneCorpus(40), "vec_id",
        "embedding", threshold = 0.9, planes = 4, maxBucketFreq = 2).count()
      (m, l)
    }
    assert(muted == loud) // the flag never touches cap semantics
    // exactly one warning in the combined capture: the unmuted call's
    assert(err.sliding("pigeonhole".length).count(_ == "pigeonhole") == 1)
  }

  test("banded generator: warns by default, mutes under expectedDegenerate") {
    val (_, errLoud) = graft.SpecSupport.capturingErr {
      SimilarityOps.cosineNearDupPairsBanded(coneCorpus(40), "vec_id",
        "embedding", threshold = 0.9, bands = 2, planesPerBand = 2,
        maxBandFreq = 2).count()
    }
    assert(errLoud.contains("cosineNearDupPairsBanded") &&
      errLoud.contains("pigeonhole"))
    val (_, errMuted) = graft.SpecSupport.capturingErr {
      SimilarityOps.cosineNearDupPairsBanded(coneCorpus(40), "vec_id",
        "embedding", threshold = 0.9, bands = 2, planesPerBand = 2,
        maxBandFreq = 2, expectedDegenerate = true).count()
    }
    assert(!errMuted.contains("pigeonhole"))
  }

  test("the recall-compare registry queries run pigeonhole-WARN-free") {
    val (_, err) = graft.SpecSupport.capturingErr {
      graft.queries.SimilarityQueries
        .capRecallCompare(spark, "/root/testdata/sf0.001").collect()
      graft.queries.SimilarityQueries
        .bandRecallCompare(spark, "/root/testdata/sf0.001").collect()
    }
    assert(!err.contains("pigeonhole"))
  }

  test("q_mine_triplets (a pinned-degenerate harness row) runs " +
    "pigeonhole-WARN-free, so the bench tail carries no expected noise") {
    val (_, err) = graft.SpecSupport.capturingErr {
      graft.queries.SimilarityQueries
        .mineTripletsQ(spark, "/root/testdata/sf0.001").collect()
    }
    assert(!err.contains("pigeonhole"))
  }
}
