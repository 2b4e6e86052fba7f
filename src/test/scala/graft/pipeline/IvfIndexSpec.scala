package graft.pipeline

import graft.SparkTestSession
import graft.streaming.PipelineStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Build/probe split of the persisted IVF index: probing the on-disk
  * index must return exactly what the in-memory trained-IVF operator
  * returns, and the probe's scan must PRUNE index partitions (the cell
  * filter reaches the source as a partition filter). */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("probe(index) == in-memory ivf; cell filter prunes partitions") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 40 === 0)
    val cents = SimilarityOps.kmeansCentroids(corpus, "vec_id", "embedding",
      k = 6, iters = 2)

    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      SimilarityOps.writeIvfIndex(corpus, "vec_id", "embedding", cents, dir)
      val probed = SimilarityOps.probeIvfIndex(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbes = 2)
      val direct = SimilarityOps.ivfTopKWithCentroids(queries, corpus,
        "vec_id", "embedding", cents, k = 3, nProbes = 2)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).sorted.toSeq
      assert(canon(probed) == canon(direct))

      // partition pruning: the index scan must carry the cell values as
      // a NON-EMPTY PartitionFilters entry (the cell attribute inside
      // the bracket — "PartitionFilters: []" must fail)
      val plan = probed.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cell#".r.findFirstIn(plan).isDefined,
        s"no cell partition filter on the index scan:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("IVF-PQ index: probe(index) == in-memory ivfPqTopK; codes scan prunes") {
    val rnd = new scala.util.Random(17)
    val corpus = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 40 === 0)
    val stride = 7
    val cbs = SimilarityOps.pqCodebooks(corpus, "vec_id", "embedding",
      numSubspaces = 2, numCodes = 8, stride = 11)
    val cents = corpus.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cent_id"),
        SimilarityOps.scaled(col("embedding")).as("cent_v"))

    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    try {
      SimilarityOps.writeIvfPqIndex(corpus, "vec_id", "embedding", cents, cbs, dir)
      val probed = SimilarityOps.probeIvfPqIndex(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbes = 2)
      val direct = SimilarityOps.ivfPqTopK(queries, corpus,
        "vec_id", "embedding", k = 3, codebooks = cbs,
        centroidStride = stride, nProbes = 2)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).sorted.toSeq
      assert(canon(probed) == canon(direct))

      // the code scan must carry the probed cells as a non-empty
      // PartitionFilters entry — "PartitionFilters: []" must fail
      val plan = probed.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cell#".r.findFirstIn(plan).isDefined,
        s"no cell partition filter on the IVF-PQ code scan:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("streaming ANN probe == batch probe, micro-batch by micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val corpus = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val cbs = SimilarityOps.pqCodebooks(corpus, "vec_id", "embedding",
      numSubspaces = 2, numCodes = 8, stride = 11)
    val cents = corpus.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("cent_id"),
        SimilarityOps.scaled(col("embedding")).as("cent_v"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    try {
      SimilarityOps.writeIvfPqIndex(corpus, "vec_id", "embedding", cents, cbs, dir)
      val qData = (0L until 300L by 40L).map { i =>
        (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
      }
      val mem = MemoryStream[(Long, Array[Float])]
      val sdf = mem.toDF.toDF("vec_id", "embedding")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val query = PipelineStreams.annProbeStream(sdf, dir, "vec_id",
          "embedding", k = 3, nProbes = 2) { (out, _) =>
        got ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      }
      try {
        mem.addData(qData.take(4): _*)
        query.processAllAvailable()
        mem.addData(qData.drop(4): _*)
        query.processAllAvailable()
      } finally query.stop()

      val batch = SimilarityOps.probeIvfPqIndex(spark,
          dir, qData.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = 3, nProbes = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).sorted.toSeq
      assert(got.sorted.toSeq == batch)
      assert(batch.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("IVF-PQ append encodes against the index's pinned quantizers") {
    val rnd = new scala.util.Random(23)
    val all = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val first = all.filter(col("vec_id") < 150)
    val second = all.filter(col("vec_id") >= 150)
    // quantizers trained on the FIRST batch only — the append must use
    // these, never retrain
    val cbs = SimilarityOps.pqCodebooks(first, "vec_id", "embedding",
      numSubspaces = 2, numCodes = 8, stride = 11)
    val cents = first.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("cent_id"),
        SimilarityOps.scaled(col("embedding")).as("cent_v"))

    val dirA = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val dirB = java.nio.file.Files.createTempDirectory("ivfpq_one").toString
    try {
      SimilarityOps.writeIvfPqIndex(first, "vec_id", "embedding", cents, cbs, dirA)
      SimilarityOps.appendIvfPqIndex(spark, dirA, second, "vec_id", "embedding")
      // reference: one-shot build of the full corpus with the SAME
      // first-batch quantizers — append must be content-identical
      SimilarityOps.writeIvfPqIndex(all, "vec_id", "embedding", cents, cbs, dirB)
      def codes(dir: String) = spark.read.parquet(s"$dir/codes")
        // partition-column type inference narrows small cell ids to int
        .select(col("id"), col("cell").cast("long"), col("codes"), col("rec_n2"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2).mkString(","), r.getLong(3))).sorted.toSeq
      assert(codes(dirA) == codes(dirB))
      // a RE-DROPPED segment is an idempotent no-op — duplicated codes
      // would put the same neighbor in multiple top-k slots
      SimilarityOps.appendIvfPqIndex(spark, dirA, second, "vec_id",
        "embedding")
      assert(codes(dirA) == codes(dirB),
        "re-appending an indexed segment must add zero code rows")

      // probes over the appended index see both batches identically
      val queries = all.filter(col("vec_id") % 40 === 0)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).sorted.toSeq
      assert(canon(SimilarityOps.probeIvfPqIndex(spark, dirA, queries,
          "vec_id", "embedding", k = 3, nProbes = 2)) ==
        canon(SimilarityOps.probeIvfPqIndex(spark, dirB, queries,
          "vec_id", "embedding", k = 3, nProbes = 2)))

      // compaction folds the append's extra per-cell files away without
      // changing a bit of content or any probe answer
      def parquetFiles(dir: String): Int = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(s"$dir/codes"))
          .count(_.getName.endsWith(".parquet"))
      }
      val before = (parquetFiles(dirA), codes(dirA))
      SimilarityOps.compactIvfPqIndex(spark, dirA)
      assert(parquetFiles(dirA) < before._1,
        s"expected fewer files after compaction, had ${before._1}")
      assert(codes(dirA) == before._2)
      assert(canon(SimilarityOps.probeIvfPqIndex(spark, dirA, queries,
          "vec_id", "embedding", k = 3, nProbes = 2)) ==
        canon(SimilarityOps.probeIvfPqIndex(spark, dirB, queries,
          "vec_id", "embedding", k = 3, nProbes = 2)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("pointer-swapped serving: probes == direct generation probes; " +
    "a RETRAIN swaps the pointer, keeps the grace pair, and changes " +
    "what probes see") {
    def corpusOf(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (0L until n.toLong).map { i =>
        (i, Array.fill(8)(r.nextFloat() * 2 - 1))
      }.toDF("vec_id", "embedding")
    }
    val day1 = corpusOf(1, 240)
    val day2 = corpusOf(2, 240) // a genuinely different corpus
    val queries = day1.filter(col("vec_id") % 60 === 0)
    def quantizers(c: org.apache.spark.sql.DataFrame) = {
      val cbs = SimilarityOps.pqCodebooks(c, "vec_id", "embedding",
        numSubspaces = 2, numCodes = 8, stride = 11)
      val cents = c.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("cent_id"),
          SimilarityOps.scaled(col("embedding")).as("cent_v"))
      (cents, cbs)
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_serve").toString
    try {
      val (c1, b1) = quantizers(day1)
      SimilarityOps.writeIvfPqServing(day1, "vec_id", "embedding",
        c1, b1, dir)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).sorted.toSeq
      val viaPointer = canon(SimilarityOps.probeIvfPqServing(spark, dir,
        queries, "vec_id", "embedding", k = 3, nProbes = 2))
      val direct = canon(SimilarityOps.probeIvfPqIndex(spark,
        s"$dir/gens/e0", queries, "vec_id", "embedding", k = 3, nProbes = 2))
      assert(viaPointer == direct && viaPointer.nonEmpty)

      // retrain on the new corpus: pointer advances, probes now answer
      // from generation 1, and generation 0 survives as the grace pair
      val (c2, b2) = quantizers(day2)
      SimilarityOps.rebuildIvfPqServing(spark, dir, day2,
        "vec_id", "embedding", c2, b2)
      assert(SimilarityOps.readIvfServingGen(spark, dir) == 1L)
      val after = canon(SimilarityOps.probeIvfPqServing(spark, dir,
        queries, "vec_id", "embedding", k = 3, nProbes = 2))
      assert(after == canon(SimilarityOps.probeIvfPqIndex(spark,
        s"$dir/gens/e1", queries, "vec_id", "embedding", k = 3, nProbes = 2)))
      assert(after != viaPointer, "a retrained corpus must answer differently")
      assert(new java.io.File(s"$dir/gens/e0").exists(),
        "the superseded generation must survive one retrain (grace)")

      // second retrain: shared GC keeps exactly {e1, e2}
      SimilarityOps.rebuildIvfPqServing(spark, dir, day1,
        "vec_id", "embedding", c1, b1)
      val gens = Option(new java.io.File(s"$dir/gens").listFiles())
        .toSeq.flatten.map(_.getName)
        .filter(n => n.startsWith("e") && n.drop(1).forall(_.isDigit)).toSet
      assert(gens == Set("e1", "e2"))

      // appends land inside the CURRENT generation
      SimilarityOps.appendIvfPqServing(spark, dir,
        corpusOf(3, 20).select((col("vec_id") + 1000).as("vec_id"),
          col("embedding")), "vec_id", "embedding")
      assert(SimilarityOps.probeIvfPqServing(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbes = 2).count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
