package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted decontamination index: screen-from-storage must equal
  * the in-memory bloom screen; incomplete artifacts fail loudly. */
class DecontamIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("screen from the stored index == in-memory bloom screen") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"w${i % 7} w${(i * 3) % 11} w${i % 7} w${(i * 5) % 13} w${i % 9} extra$i")
    }.toDF("id", "text")
    val bench = docs.filter(col("id") % 10 === 0)
    val mem = TextOps.contaminationScreenBloom(docs, bench, "text", "id", 3, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    TextOps.writeDecontamIndex(bench, "text", "id", dir, 3)
    val meta = TextOps.readDecontamIndexMeta(spark, dir)
    assert(meta.shingleK == 3 && meta.epoch == 0L && meta.shRows > 0)
    val stored = TextOps.screenAgainstStoredDecontam(spark, dir, docs, "text", "id", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == mem)
    assert(stored.nonEmpty, "fixture must produce at least the self-matches")
  }

  test("append == one-shot build over the union; epoch advances") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"w${i % 7} w${(i * 3) % 11} w${i % 7} w${(i * 5) % 13} w${i % 9} extra$i")
    }.toDF("id", "text")
    val b1 = docs.filter(col("id") % 10 === 0)
    val b2 = docs.filter(col("id") % 10 === 5)
    val oneDir = java.nio.file.Files.createTempDirectory("graft_dc_one").toString
    TextOps.writeDecontamIndex(b1.unionByName(b2), "text", "id", oneDir, 3)
    val appDir = java.nio.file.Files.createTempDirectory("graft_dc_app").toString
    TextOps.writeDecontamIndex(b1, "text", "id", appDir, 3)
    TextOps.appendDecontamIndex(spark, appDir, b2, "text", "id")
    val m = TextOps.readDecontamIndexMeta(spark, appDir)
    assert(m.epoch == 1L)
    assert(m.shRows == TextOps.readDecontamIndexMeta(spark, oneDir).shRows)
    def screen(dir: String) =
      TextOps.screenAgainstStoredDecontam(spark, dir, docs, "text", "id", 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(screen(appDir) == screen(oneDir))
    // the previous epoch stayed on disk (in-flight reader grace)
    assert(new java.io.File(s"$appDir/shingles/e0").exists())
  }

  test("missing artifact fails loudly") {
    val e = intercept[IllegalStateException] {
      TextOps.screenAgainstStoredDecontam(spark, "/tmp/graft_no_such_idx",
        Seq((1L, "a b c d")).toDF("id", "text"), "text", "id", 1L)
    }
    assert(e.getMessage.contains("no readable meta"))
  }
}
