package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Epoch garbage collection ([[MetaIO.pruneEpochs]]) — the code that
  * DELETES directories inside the append path of every epoch'd
  * artifact lifecycle, so its contract is pinned here directly and
  * then re-asserted through each lifecycle's own public append:
  *
  *  - after an append, exactly {current, superseded} epochs remain
  *    under every relation root (one commit's grace window);
  *  - the superseded epoch is still PROBE-READABLE (a reader that
  *    resolved the old meta just before the swap finishes its probe);
  *  - non-epoch siblings (`signatures`, `meta`, loose files) are
  *    never touched;
  *  - a missing root (first commit) is a no-op, and the call is
  *    idempotent.
  *
  * Lifecycles covered here: MinHash index (derived), decontamination
  * (shingles + bloom), LM model (counts + ctx, incl. the compact
  * path), k-means model (centroids), HLL index (regs); the sixth
  * epoch'd artifact — the quantile-sketch index (buckets) — pins the
  * same grace-pair invariant in QuantileSketchSpec. The IVF-PQ index
  * is append-in-place + compact, not epoch'd — its storage story is
  * pinned by IvfIndexSpec/ServeSoakMain instead. */
class EpochGcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_egc_$tag").toString

  private def epochs(root: String): Set[String] =
    graft.SpecSupport.epochs(root)

  private def children(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName).toSet

  // ---------------------------------------------------------------
  // the helper's own contract
  // ---------------------------------------------------------------

  test("pruneEpochs deletes strictly-older epochs only, never " +
    "non-epoch children; idempotent; missing root is a no-op") {
    val root = tmp("unit")
    // epoch dirs at 0, 1, 2, 5 plus look-alikes that must survive
    Seq("e0", "e1", "e2", "e5", "extra", "e", "e1x", "meta")
      .foreach(n => new java.io.File(root, n).mkdirs())
    val loose = new java.io.File(root, "e3") // an epoch-named FILE
    loose.createNewFile()

    MetaIO.pruneEpochs(spark, Seq(root), superseded = 2L)
    assert(epochs(root) == Set("e2", "e3", "e5"),
      "e0/e1 (older than superseded) go; e2 (superseded) and newer stay")
    assert(children(root).intersect(Set("extra", "e", "e1x", "meta")) ==
      Set("extra", "e", "e1x", "meta"),
      "non-epoch children are never touched")

    // idempotent: a second identical call changes nothing
    MetaIO.pruneEpochs(spark, Seq(root), superseded = 2L)
    assert(epochs(root) == Set("e2", "e3", "e5"))

    // missing root: no throw, no effect elsewhere
    MetaIO.pruneEpochs(spark, Seq(s"$root/never_written"), superseded = 9L)
    assert(!new java.io.File(s"$root/never_written").exists())

    // superseded = -1 (initial-commit convention): deletes nothing
    val fresh = tmp("unit_fresh")
    new java.io.File(fresh, "e0").mkdirs()
    MetaIO.pruneEpochs(spark, Seq(fresh), superseded = -1L)
    assert(epochs(fresh) == Set("e0"))
  }

  // ---------------------------------------------------------------
  // MinHash index: derived/e<N> under appendMinhashIndex
  // ---------------------------------------------------------------

  test("minhash index: appends keep exactly {current, superseded} " +
    "derived epochs; superseded stays probe-readable; signatures untouched") {
    def day(ids: Seq[Long], tok: String) =
      ids.map(i => (i, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5 ${tok}6"))
        .toDF("doc_id", "text")
    val dir = tmp("mh")
    DedupOps.writeMinhashIndex(day(Seq(2L), "w"), "text", "doc_id", dir, 3, 12, 4)
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(4L), "x"), "text", "doc_id")
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(6L), "y"), "text", "doc_id")
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(8L), "z"), "text", "doc_id")

    val meta = DedupOps.readMinhashIndexMeta(spark, dir)
    assert(meta.epoch == 3L)
    assert(epochs(s"$dir/derived") == Set("e2", "e3"),
      "exactly {current, superseded} epochs after 3 appends")
    // grace: the superseded epoch's relations still read cleanly
    assert(spark.read.parquet(s"$dir/derived/e2/bandkeys").count() > 0)
    assert(spark.read.parquet(s"$dir/derived/e2/bloom").count() > 0)
    // the signature window intact: all four days' signatures present
    assert(DedupOps.readStoredSignatures(spark, dir, meta).count() == 4)
  }

  // ---------------------------------------------------------------
  // decontamination index: shingles/e<N> + bloom/e<N>
  // ---------------------------------------------------------------

  test("decontam index: both relation roots hold exactly {current, " +
    "superseded}; superseded stays probe-readable") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"w${i % 7} w${(i * 3) % 11} w${i % 7} w${(i * 5) % 13} w${i % 9}")
    }.toDF("id", "text")
    val dir = tmp("dc")
    TextOps.writeDecontamIndex(docs.filter(col("id") % 10 === 0),
      "text", "id", dir, 3)
    TextOps.appendDecontamIndex(spark, dir,
      docs.filter(col("id") % 10 === 5), "text", "id")
    TextOps.appendDecontamIndex(spark, dir,
      docs.filter(col("id") % 10 === 3), "text", "id")

    assert(TextOps.readDecontamIndexMeta(spark, dir).epoch == 2L)
    assert(epochs(s"$dir/shingles") == Set("e1", "e2"))
    assert(epochs(s"$dir/bloom") == Set("e1", "e2"))
    assert(spark.read.parquet(s"$dir/shingles/e1").count() > 0)
    assert(spark.read.parquet(s"$dir/bloom/e1").count() > 0)
  }

  // ---------------------------------------------------------------
  // LM model: counts/e<N> + ctx/e<N>, append AND compact paths
  // ---------------------------------------------------------------

  test("lm model: appends and compaction keep exactly {current, " +
    "superseded} under counts and ctx; superseded stays score-readable") {
    val df = (0 until 30).map { i =>
      (i.toLong, s"tok${i % 5} tok${(i * 3) % 7} tok${i % 5} tok${(i * 2) % 4}")
    }.toDF("id", "text")
    val dir = tmp("lm")
    TextOps.writeLmModel(df.filter(col("id") < 10), "text", "id", dir)
    TextOps.appendLmModel(spark, dir, df.filter(col("id") >= 10 && col("id") < 20),
      "text", "id")
    TextOps.appendLmModel(spark, dir, df.filter(col("id") >= 20), "text", "id")

    assert(TextOps.readLmModelMeta(spark, dir).epoch == 2L)
    assert(epochs(s"$dir/counts") == Set("e1", "e2"))
    assert(epochs(s"$dir/ctx") == Set("e1", "e2"))
    assert(spark.read.parquet(s"$dir/counts/e1").count() > 0)
    assert(spark.read.parquet(s"$dir/ctx/e1").count() > 0)

    // compaction is a sibling-epoch commit — same GC discipline
    TextOps.compactLmModel(spark, dir)
    assert(TextOps.readLmModelMeta(spark, dir).epoch == 3L)
    assert(epochs(s"$dir/counts") == Set("e2", "e3"))
    assert(epochs(s"$dir/ctx") == Set("e2", "e3"))
    // and the model still scores from storage after GC
    assert(TextOps.scoreAgainstStoredLm(spark, dir, df, "text", "id").count() == 30)
  }

  // ---------------------------------------------------------------
  // k-means model: centroids/e<N> under refitKmeansModel
  // ---------------------------------------------------------------

  test("kmeans model: refits keep exactly {current, superseded} " +
    "centroid epochs; superseded stays assignment-readable") {
    val df = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0L else 100L
      (i.toLong, Seq(base + i % 3, base - i % 5, (i % 7).toLong))
    }.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
      .withColumn("vec", transform(col("vec"), x => (x / 1000.0).cast("float")))
    val dir = tmp("km")
    val cents = SimilarityOps.kmeansCentroids(df, "id", "vec", k = 3, iters = 2)
    SimilarityOps.writeKmeansModel(cents, dir, itersTrained = 2)
    SimilarityOps.refitKmeansModel(spark, dir, df, "id", "vec", iters = 1)
    SimilarityOps.refitKmeansModel(spark, dir, df, "id", "vec", iters = 1)

    assert(SimilarityOps.readKmeansModelMeta(spark, dir).epoch == 2L)
    assert(epochs(s"$dir/centroids") == Set("e1", "e2"))
    assert(spark.read.parquet(s"$dir/centroids/e1").count() == 3,
      "superseded epoch still holds the full k-row centroid relation")
  }

  // ---------------------------------------------------------------
  // HLL index: regs/e<N> under appendHllIndex
  // ---------------------------------------------------------------

  // ---------------------------------------------------------------
  // WARC index: entries/e<N> + walked/e<N> — a RANGE pointer, so the
  // grace unit is a GENERATION [base, epoch], not a single epoch
  // ---------------------------------------------------------------

  test("warc index: compaction prunes epochs below the OLD base under " +
    "both roots — {current} + the superseded generation remain, " +
    "appends never prune, the read is identical throughout") {
    val ids1 = Seq(0L, 2L); val ids2 = Seq(1L, 3L); val ids3 = Seq(5L, 12L)
    val all = ids1 ++ ids2 ++ ids3
    val dir = tmp("warc_corpus")
    graft.sources.TableSources.writeBinaryDir(
      WarcOps.encodeSyntheticWarcGz(all.toDF("id"), "id"),
      dir, "media_id", "content", ".warc.gz")
    def files(ids: Seq[Long]) = graft.sources.TableSources
      .listBinaryDir(spark, dir, "*.warc.gz")
      .withColumn("media_id", regexp_extract(col("media_path"),
        "clip_(\\d+)\\.warc\\.gz$", 1).cast("long"))
      .filter(col("media_id").isin(ids: _*))
    val idx = tmp("warc_idx")
    val oneShot = WarcOps.warcMemberIndexRanged(files(all), "media_path",
      "media_id")
    def readSet = WarcOps.readWarcIndex(spark, idx)
      .collect().map(_.toSeq).toSet
    def expectSet(ids: Seq[Long]) = WarcOps.warcMemberIndexRanged(
      files(ids), "media_path", "media_id").collect().map(_.toSeq).toSet

    WarcOps.writeWarcIndex(files(ids1), "media_path", "media_id", idx) // e0
    WarcOps.appendWarcIndex(spark, idx, files(ids2), "media_path",
      "media_id") // e1
    assert(epochs(s"$idx/entries") == Set("e0", "e1") &&
      epochs(s"$idx/walked") == Set("e0", "e1"),
      "appends never prune: the live window [base, epoch] only grows")
    assert(readSet == expectSet(ids1 ++ ids2))

    WarcOps.compactWarcIndex(spark, idx) // e2; old base 0 → prunes e<0: none
    assert(epochs(s"$idx/entries") == Set("e0", "e1", "e2") &&
      epochs(s"$idx/walked") == Set("e0", "e1", "e2"),
      "first compaction supersedes generation [0,1] — it stays for grace")
    assert(readSet == expectSet(ids1 ++ ids2))

    WarcOps.appendWarcIndex(spark, idx, files(ids3), "media_path",
      "media_id") // e3
    WarcOps.compactWarcIndex(spark, idx) // e4; old base 2 → prunes e0, e1
    assert(epochs(s"$idx/entries") == Set("e2", "e3", "e4") &&
      epochs(s"$idx/walked") == Set("e2", "e3", "e4"),
      "second compaction deletes the generation no reader can still hold " +
        "(below the old base) and keeps {current} + superseded generation")
    // grace: the superseded generation is still probe-readable
    assert(spark.read.parquet(s"$idx/entries/e2").count() > 0)
    assert(spark.read.parquet(s"$idx/walked/e2").count() > 0)
    val oneShotSet = oneShot.collect().map(_.toSeq).toSet
    assert(readSet == oneShotSet,
      "the compacted+pruned snapshot equals the one-shot index exactly")

    // the POLICY wrapper a continuous maintainer uses: below the bound
    // it's a no-op, at the bound it compacts (janitor included)
    assert(!WarcOps.maybeCompactWarcIndex(spark, idx, maxEpochs = 2),
      "a 1-epoch window must not compact") // window is {e4}
    WarcOps.appendWarcIndex(spark, idx, files(all), "media_path",
      "media_id") // e5 (empty delta: everything already walked)
    assert(WarcOps.maybeCompactWarcIndex(spark, idx, maxEpochs = 2),
      "a window at the bound must compact") // [4,5] → e6, base 6
    assert(epochs(s"$idx/entries") == Set("e4", "e5", "e6") &&
      epochs(s"$idx/walked") == Set("e4", "e5", "e6"),
      "policy compaction prunes below the old base like any compaction")
    assert(readSet == oneShotSet)
  }

  test("hll index: appends keep exactly {current, superseded} register " +
    "epochs; superseded stays estimate-readable; estimates unchanged") {
    val dir = tmp("hll")
    StatsOps.writeHllIndex(
      (0 until 500).map(i => ("g", s"a$i")).toDF("g", "v"),
      Seq("g"), col("v"), dir, m = 64)
    StatsOps.appendHllIndex(spark, dir,
      (0 until 400).map(i => ("g", s"b$i")).toDF("g", "v"), col("v"))
    StatsOps.appendHllIndex(spark, dir,
      (0 until 300).map(i => ("g", s"c$i")).toDF("g", "v"), col("v"))

    assert(StatsOps.readHllIndexMeta(spark, dir).epoch == 2L)
    assert(epochs(s"$dir/regs") == Set("e1", "e2"))
    assert(spark.read.parquet(s"$dir/regs/e1").count() > 0)
    // GC'd artifact still estimates exactly like the one-shot twin
    val stored = StatsOps.estimateFromStoredHll(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = StatsOps.hllEstimateByGroup(
        ((0 until 500).map(i => ("g", s"a$i")) ++
          (0 until 400).map(i => ("g", s"b$i")) ++
          (0 until 300).map(i => ("g", s"c$i"))).toDF("g", "v"),
        Seq("g"), col("v"), m = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == oneShot)
  }
}
