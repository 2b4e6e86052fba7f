package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted k-means model lifecycle: write → load → assign must
  * equal in-memory assignment; warm-start refits land as new epochs
  * behind a meta swap; incomplete artifacts fail loudly. */
class KmeansModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(n: Int, shift: Long = 0L) =
    (0 until n).map { i =>
      val base = if (i % 2 == 0) 0L else 100L
      (i.toLong, Seq(base + shift + i % 3, base - i % 5, (i % 7).toLong))
    }.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
      .withColumn("vec", transform(col("vec"), x => (x / 1000.0).cast("float")))

  test("write -> load -> assign == in-memory assignment") {
    val df = vecs(60)
    val train = df.filter(col("id") % 2 === 0)
    val cents = SimilarityOps.kmeansCentroids(train, "id", "vec", k = 4, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_km_model").toString
    SimilarityOps.writeKmeansModel(cents, dir, itersTrained = 3)

    val mem = SimilarityOps.assignToCentroids(df, "id", "vec", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = SimilarityOps.assignFromStoredKmeans(spark, dir, df, "id", "vec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == mem)

    val meta = SimilarityOps.readKmeansModelMeta(spark, dir)
    assert(meta.k == 4 && meta.dim == 3 && meta.epoch == 0L)
  }

  test("refit: new epoch behind the meta swap; iters=0 is a no-op refit") {
    val df = vecs(60)
    val cents = SimilarityOps.kmeansCentroids(df, "id", "vec", k = 3, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_km_refit").toString
    SimilarityOps.writeKmeansModel(cents, dir, itersTrained = 2)
    val before = SimilarityOps.readKmeansModel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    // iters=0: epoch advances, centroids unchanged
    SimilarityOps.refitKmeansModel(spark, dir, df, "id", "vec", iters = 0)
    val m1 = SimilarityOps.readKmeansModelMeta(spark, dir)
    assert(m1.epoch == 1L && m1.itersTrained == 2)
    val after0 = SimilarityOps.readKmeansModel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(after0 == before)

    // a real refit on SHIFTED data moves centroids and equals the
    // in-memory warm-start twin
    val shifted = vecs(60, shift = 40L)
    SimilarityOps.refitKmeansModel(spark, dir, shifted, "id", "vec", iters = 2)
    val m2 = SimilarityOps.readKmeansModelMeta(spark, dir)
    assert(m2.epoch == 2L && m2.itersTrained == 4)
    val refit = SimilarityOps.readKmeansModel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val v = shifted.select(col("id").as("vid"),
        SimilarityOps.scaled(col("vec")).as("sv"))
      .filter(size(col("sv")) > 0)
    val twin = SimilarityOps.lloydRounds(v,
        before.toSeq.sortBy(_._1), 2)
      .map { case (id, cv) => id -> cv }.toMap
    assert(refit == twin)
    assert(refit != before, "shifted refit must move at least one centroid")

    // the previous epoch directory is still intact (immutable epochs)
    assert(new java.io.File(s"$dir/centroids/e1").exists())
  }

  test("incomplete artifacts fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_km_bad").toString
    val e1 = intercept[IllegalStateException] {
      SimilarityOps.readKmeansModel(spark, dir)
    }
    assert(e1.getMessage.contains("no readable meta"))

    // truncated centroid relation: pin says k=3, store holds 2
    val df = vecs(30)
    val cents = SimilarityOps.kmeansCentroids(df, "id", "vec", k = 3, iters = 1)
    SimilarityOps.writeKmeansModel(cents, dir, itersTrained = 1)
    val cDir = new java.io.File(s"$dir/centroids/e0")
    cents.filter(col("cent_id") < 2).coalesce(1)
      .write.mode("overwrite").parquet(cDir.getPath)
    val e2 = intercept[IllegalArgumentException] {
      SimilarityOps.readKmeansModel(spark, dir)
    }
    assert(e2.getMessage.contains("incomplete or corrupt"))
  }
}
