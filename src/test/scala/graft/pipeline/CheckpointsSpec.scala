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

  /** ONE stable checkpoint dir for the whole suite, registered lazily
    * and never deleted while the shared session lives: deleting a
    * registered dir would leave getCheckpointDir pointing at a dead
    * path for every later suite (the reliable mode's fail-fast require
    * would pass while checkpoints landed in a grave) — the shared-
    * session state leak this suite used to cause. */
  private lazy val ckptDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ckpt_suite")
    // deleteOnExit is a no-op on non-empty dirs (checkpoint blocks land
    // inside) — a recursive shutdown hook actually cleans up while
    // keeping the dir registered and LIVE for the session's lifetime
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
    spark.sparkContext.setCheckpointDir(d.toString)
    d.toString
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
    ckptDir // register the suite dir BEFORE severing
    withMode(Some("reliable")) {
      val severed = Checkpoints.sever(spark.range(50).toDF("id"))
      assert(severed.count() === 50)
      val root = new java.io.File(ckptDir)
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
      assert(anyFile(root), "reliable checkpoint left no files on disk")
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
    ckptDir // ensure the suite dir is registered
    val vecs = (0 until 60).map { i =>
      val base = if (i % 3 == 0) Seq(1.0f, 0.9f, 0.8f, 0.7f)
                 else Seq(-0.5f + i * 0.01f, 0.3f, -0.9f, 0.2f + i * 0.02f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    def run(): Set[(Long, Long)] =
      SimilarityOps.cosineNearDupPairs(vecs, "vec_id", "embedding",
          threshold = 0.9, planes = 4, maxBucketFreq = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val local = withMode(None)(run())
    val reliable = withMode(Some("reliable"))(run())
    assert(local === reliable)
  }
}
