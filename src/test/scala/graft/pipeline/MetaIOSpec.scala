package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the shared meta-pointer plumbing every artifact
  * lifecycle rides on: the empty-meta guard (an interrupted write that
  * left a readable-but-empty relation must fail with the artifact's
  * label, not a bare index error) and the committed-vs-partial
  * sideways-swap recovery. */
class MetaIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_metaio_$tag").toString

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("readMetaRow: a meta relation that exists but holds zero rows " +
    "fails with the labeled interrupted-write error, not a bare " +
    "index-out-of-bounds") {
    val dir = tmp("empty")
    spark.range(0).selectExpr("id AS epoch")
      .coalesce(1).write.parquet(s"$dir/meta")
    val err = intercept[IllegalStateException] {
      MetaIO.readMetaRow(spark, dir, "lm model", "model")
    }
    assert(err.getMessage.contains("lm model") &&
      err.getMessage.contains("empty meta"))
  }

  test("dirExistsOrRecover: a COMMITTED sideways copy is promoted; an " +
    "unmarked one holding data is LEFT for the operator (never " +
    "deleted); a dataless one is deleted") {
    // committed: a real Spark write (produces _SUCCESS + a part file)
    val a = tmp("commit")
    Seq((1L, 2L)).toDF("x", "y").coalesce(1)
      .write.parquet(s"$a/meta__next")
    assert(MetaIO.dirExistsOrRecover(spark, s"$a/meta"),
      "a committed tmp must be promoted")
    assert(fs(a).exists(new org.apache.hadoop.fs.Path(s"$a/meta")))
    assert(!fs(a).exists(new org.apache.hadoop.fs.Path(s"$a/meta__next")))
    assert(spark.read.parquet(s"$a/meta").count() == 1L)
    // unmarked-with-data: either a torn write OR a complete write on a
    // deployment that disables _SUCCESS markers — indistinguishable, so
    // it must NOT be promoted and must NOT be deleted (deleting would
    // permanently destroy a marker-less artifact's only meta); the
    // caller's loud refusal fires and the operator repairs by hand
    val b = tmp("partial")
    fs(b).mkdirs(new org.apache.hadoop.fs.Path(s"$b/meta__next"))
    val out = fs(b).create(new org.apache.hadoop.fs.Path(
      s"$b/meta__next/part-00000-torn.parquet"))
    out.write(Array[Byte](9, 9, 9)); out.close()
    assert(!MetaIO.dirExistsOrRecover(spark, s"$b/meta"),
      "an unmarked tmp must not be promoted")
    assert(fs(b).exists(new org.apache.hadoop.fs.Path(s"$b/meta__next")),
      "an unmarked tmp HOLDING DATA must be left in place for the " +
        "operator — it may be a complete marker-less write")
    assert(!fs(b).exists(new org.apache.hadoop.fs.Path(s"$b/meta")))
    // dataless (mkdir'd or marker-only): unambiguously torn — deleted
    val c = tmp("marker")
    fs(c).mkdirs(new org.apache.hadoop.fs.Path(s"$c/meta__next"))
    fs(c).create(new org.apache.hadoop.fs.Path(
      s"$c/meta__next/_SUCCESS")).close()
    assert(!MetaIO.dirExistsOrRecover(spark, s"$c/meta"))
    assert(!fs(c).exists(new org.apache.hadoop.fs.Path(s"$c/meta__next")),
      "a dataless tmp is an unambiguous partial and is cleaned up")
  }
}
