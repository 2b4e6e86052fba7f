package graft.sources

import graft.SparkTestSession
import graft.operators.OrderBookOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every driver table reads with its declared schema") {
    val sf = "/root/testdata/sf0.001"
    TableSources.schemas.keys.foreach { t =>
      val df = TableSources.read(spark, sf, t)
      assert(df.count() > 0, t)
      assert(df.schema == TableSources.schemas(t), t)
    }
  }

  for (format <- Seq("orc", "json", "csv", "parquet")) {
    test(s"$format round-trip preserves a derived stream and feeds the replay") {
      val stream = graft.queries.EventStreams
        .bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
      TableSources.write(stream, dir, format)
      val back = TableSources.readBack(spark, dir, format, stream.schema)
      assert(back.count() == 1000)
      val out = OrderBookOps.topNLevelsFromPriceUpdates(
        back, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      // replay over the round-tripped stream matches the direct replay
      val direct = OrderBookOps.topNLevelsFromPriceUpdates(
        stream, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      val a = out.orderBy("product", "seq").collect()
      val b = direct.orderBy("product", "seq").collect()
      assert(a.length == 1000 && a.toSeq == b.toSeq)
    }
  }

  test("binaryFile ingestion: ON-DISK media files feed the metadata " +
    "walks exactly like the synthetic encoders") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ops = graft.pipeline.MultimodalOps
    val dir = java.nio.file.Files.createTempDirectory("graft_media_dir")
    // write real MP4 and FLAC files to disk, plus a decoy the glob skips
    val mp4Ids = Seq(2L, 3L)
    ops.encodeSyntheticMp4(mp4Ids.toDF("id"), "id").collect().foreach { r =>
      java.nio.file.Files.write(dir.resolve(s"clip_${r.getLong(0)}.mp4"),
        r.getAs[Array[Byte]](1))
    }
    ops.encodeSyntheticFlac(Seq(5L).toDF("id"), "id").collect().foreach { r =>
      java.nio.file.Files.write(dir.resolve("track_5.flac"),
        r.getAs[Array[Byte]](1))
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "not media".getBytes("US-ASCII"))

    // glob prunes at the listing: only the .mp4 files are ever opened
    val mp4s = TableSources.readBinaryDir(spark, dir.toString, "*.mp4")
      .withColumn("media_id",
        regexp_extract(col("media_path"), "clip_(\\d+)\\.mp4", 1)
          .cast("long"))
    assert(mp4s.count() == 2)
    val samples = ops.mp4SampleTable(mp4s, "content", "media_id")
      .groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(samples == mp4Ids.map(id =>
      id -> ops.synthMp4Samples(id).toLong).toMap,
      "on-disk MP4s must resolve the same sample tables as in-flight ones")

    val flacs = TableSources.readBinaryDir(spark, dir.toString, "*.flac")
      .select(ops.flacMeta(col("content")).as("m")).select(col("m.*"))
      .collect()
    assert(flacs.length == 1 && flacs(0).getBoolean(1))
    assert(flacs(0).getLong(3) == ops.synthFlacSampleRate(5L))
  }

  test("writeBinaryDir: temp-name + rename leaves no temp files, " +
    "overwrites a prior corpus, and stays invisible to the listing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wbd").toString
    val ids = Seq(1L, 2L, 3L)
    TableSources.writeBinaryDir(
      ids.map(i => (i, Array.fill[Byte](8)(i.toByte))).toDF("id", "content"),
      dir, "id", "content", ".bin")
    // a re-run with different bytes REPLACES the corpus (rename-over)
    TableSources.writeBinaryDir(
      ids.map(i => (i, Array.fill[Byte](16)((i + 1).toByte))).toDF("id", "content"),
      dir, "id", "content", ".bin")
    // Hadoop's local ChecksumFileSystem shadows each file with a .crc —
    // those are not ours; everything else must be the three final names
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.endsWith(".crc")).sorted
    assert(files.toSeq == Seq("clip_1.bin", "clip_2.bin", "clip_3.bin"),
      s"no temp leftovers expected: ${files.toSeq}")
    assert(java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "clip_2.bin")) == 16L)
    // listing sees exactly the final names even if a stale temp lingers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".clip_9.bin.77.tmp"), Array[Byte](1))
    assert(TableSources.listBinaryDir(spark, dir, "*.bin").count() == 3L)
  }

  test("scratchDir registers with the shared hook; purgeScratch cleans " +
    "eagerly") {
    val d1 = TableSources.scratchDir("graft_scr1_")
    val d2 = TableSources.scratchDir("graft_scr2_")
    java.nio.file.Files.write(java.nio.file.Paths.get(d1, "x"), Array[Byte](1))
    java.nio.file.Files.write(java.nio.file.Paths.get(d2, "y"), Array[Byte](2))
    TableSources.purgeScratch()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d2)))
  }

  test("memoScratchDir survives purgeScratch: a memo hit whose dir was " +
    "purged re-stages instead of handing out the dangling path") {
    val memo = scala.collection.concurrent.TrieMap.empty[String, String]
    var stagings = 0
    def lookup() = TableSources.memoScratchDir(memo, "k") {
      stagings += 1
      val d = TableSources.scratchDir("graft_memo_")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "corpus.bin"), Array[Byte](7))
      d
    }
    val first = lookup()
    assert(lookup() == first && stagings == 1, "a live dir memoizes")
    TableSources.purgeScratch()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(first)))
    val second = lookup()
    assert(second != first && stagings == 2,
      "the stale entry must be dropped and re-staged")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(second, "corpus.bin")))
    assert(lookup() == second && stagings == 2, "the re-stage memoizes")
  }

  test("binary manifest: snapshot equals the live listing, feeds the " +
    "content-free walks, and rejects a wrong-schema relation loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_man").toString
    TableSources.writeBinaryDir(
      Seq((3L, "aaa"), (7L, "bbbb")).toDF("id", "body")
        .select(col("id"), col("body").cast("binary").as("content")),
      dir, "id", "content", ".bin")
    val man = s"$dir/_manifest"
    TableSources.writeBinaryManifest(spark, dir, man, "*.bin")
    // the underscore-prefixed manifest dir is invisible to the listing
    val listed = TableSources.listBinaryDir(spark, dir, "*.bin")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val fromMan = TableSources.readBinaryManifest(spark, man)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(fromMan == listed && fromMan.size == 2)
    // a manifest missing media_len must be rejected with the schema,
    // not half-read into a walk that then plans zero shards
    val bad = s"$dir/_manifest_bad"
    Seq("x").toDF("media_path").write.parquet(bad)
    val err = intercept[IllegalArgumentException] {
      TableSources.readBinaryManifest(spark, bad)
    }
    assert(err.getMessage.contains("media_len"))
  }

  test("ANSI mode: pathId skips a stray filename (null, filtered) where " +
    "the bare cast pattern throws — the walk survives a user-supplied dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi").toString
    TableSources.writeBinaryDir(
      graft.pipeline.WarcOps.encodeSyntheticWarcGz(Seq(1L).toDF("id"), "id"),
      dir, "media_id", "content", ".warc.gz")
    // glob-matching, pattern-missing: the production stray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "segment-0001.warc.gz"),
      Array.fill[Byte](16)(0x1f))
    // pattern-MATCHING but long-overflowing: the other ANSI door (a
    // 20-digit capture passes the no-match guard and dies in the cast)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "clip_99999999999999999999.warc.gz"),
      Array.fill[Byte](16)(0x1f))
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val pat = "clip_(\\d+)\\.warc\\.gz$"
      val listed = TableSources.listBinaryDir(spark, dir, "*.warc.gz")
      // the bare cast is the bug class being swept: ANSI throws on the
      // no-match empty string and one stray kills the whole walk
      val bare = listed.withColumn("media_id",
        regexp_extract(col("media_path"), pat, 1).cast("long"))
      val thrown = intercept[Exception] { bare.collect() }
      def chain(e: Throwable): Seq[Throwable] =
        if (e == null) Nil else e +: chain(e.getCause)
      assert(chain(thrown).exists(t => t.getMessage != null &&
        (t.getMessage.contains("CAST_INVALID_INPUT") ||
          t.getMessage.contains("CAST_OVERFLOW") ||
          t.getMessage.toLowerCase.contains("overflow") ||
          t.getMessage.contains("cannot be cast"))),
        s"expected an ANSI cast failure, got: $thrown")
      // the guarded parse walks on: the stray skips, the real file indexes
      val files = listed
        .withColumn("media_id", TableSources.pathId(col("media_path"), pat))
        .filter(col("media_id").isNotNull)
      val idx = graft.pipeline.WarcOps
        .warcMemberIndexRanged(files, "media_path", "media_id")
        .select("media_id").distinct().as[Long].collect().toSet
      assert(idx == Set(1L))
      // 19-digit boundary: the FULL non-negative long range parses —
      // Long.MaxValue is a valid id, one past it is a stray (null),
      // and neither throws under ANSI
      val names = Seq(
        s"a/clip_${Long.MaxValue}.warc.gz", // 9223372036854775807
        "a/clip_9223372036854775808.warc.gz", // MaxValue + 1: 19 digits, overflows
        "a/clip_999999999999999999.warc.gz" // 18 digits, always fine
      ).toDF("media_path")
      val parsed = names
        .withColumn("media_id", TableSources.pathId(col("media_path"), pat))
        .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
      assert(parsed(0).contains(Long.MaxValue),
        "a 19-digit id at Long.MaxValue must parse")
      assert(parsed(1).isEmpty,
        "a 19-digit id past Long.MaxValue must skip as a stray")
      assert(parsed(2).contains(999999999999999999L))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("partitioned write produces one directory per key") {
    val stream = graft.queries.EventStreams
      .bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    TableSources.write(stream, dir, "parquet", partitionBy = Seq("product"))
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("product="))
    assert(parts.length == 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
  }
}
