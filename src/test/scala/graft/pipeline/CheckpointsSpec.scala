package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The lineage-severing knob ([[Checkpoints.ConfKey]]): local (default),
  * reliable (storage-backed, requires a checkpoint dir), and the
  * fail-fast paths. Also pins that the capped pair generator keeps its
  * results identical under either severing mode — the knob trades
  * executor-loss semantics, never data. */
class CheckpointsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withMode[A](mode: Option[String])(body: => A): A = {
    mode.foreach(m => spark.conf.set(Checkpoints.ConfKey, m))
    try body finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("default mode is local: severed relation keeps its rows, lineage cut") {
    val df = spark.range(100).toDF("id")
    val severed = Checkpoints.sever(df)
    assert(severed.count() === 100)
    // a local checkpoint truncates the plan to a scan of cached blocks
    assert(severed.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")))
  }

  test("reliable mode without a checkpoint dir fails fast with a pointer") {
    withMode(Some("reliable")) {
      val err = intercept[IllegalArgumentException] {
        Checkpoints.sever(spark.range(3).toDF("id"))
      }
      assert(err.getMessage.contains("setCheckpointDir"))
    }
  }

  test("reliable mode writes blocks under the registered checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try withMode(Some("reliable")) {
      val severed = Checkpoints.sever(spark.range(50).toDF("id"))
      assert(severed.count() === 50)
      val root = new java.io.File(dir)
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
      assert(anyFile(root), "reliable checkpoint left no files on disk")
    } finally {
      // the test session is shared: leave no checkpoint dir behind for
      // other suites (local mode never reads it)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("unknown mode is rejected") {
    withMode(Some("turbo")) {
      val err = intercept[IllegalArgumentException] {
        Checkpoints.sever(spark.range(3).toDF("id"))
      }
      assert(err.getMessage.contains("turbo"))
    }
  }

  test("capped pair generator yields identical pairs under both modes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    spark.sparkContext.setCheckpointDir(dir)
    val vecs = (0 until 60).map { i =>
      val base = if (i % 3 == 0) Seq(1.0f, 0.9f, 0.8f, 0.7f)
                 else Seq(-0.5f + i * 0.01f, 0.3f, -0.9f, 0.2f + i * 0.02f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    def run(): Set[(Long, Long)] =
      SimilarityOps.cosineNearDupPairs(vecs, "vec_id", "embedding",
          threshold = 0.9, planes = 4, maxBucketFreq = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    try {
      val local = withMode(None)(run())
      val reliable = withMode(Some("reliable"))(run())
      assert(local === reliable)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
