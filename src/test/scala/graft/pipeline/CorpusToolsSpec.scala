package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 corpus tooling: split assignment, shard layout, contamination
  * fraction, canonical normalization, distinctive terms, ANN recall, and
  * the single-pass corpus filter. */
class CorpusToolsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The minhash index's VISIBLE signatures — the meta window's epoch
    * union, what probes actually read. */
  private def storedSigs(dir: String) =
    DedupOps.readStoredSignatures(spark, dir,
      DedupOps.readMinhashIndexMeta(spark, dir))

  test("assignSplit: total cover, determinism, nested buckets, rough proportions") {
    val ids = spark.range(0, 2000).toDF("id")
    val s1 = SamplingOps.assignSplit(ids, "id", 100, 200)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1.size == 2000)
    assert(s1.values.toSet.subsetOf(Set("train", "validation", "test")))
    // deterministic across evaluations
    val s2 = SamplingOps.assignSplit(ids, "id", 100, 200)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2)
    // nested buckets: test at 200 permille ⊇ test at 100 permille
    val narrow = SamplingOps.assignSplit(ids, "id", 0, 100)
      .filter(col("split") === "test").select("id").as[Long].collect().toSet
    val wide = s1.collect { case (id, "test") => id }.toSet
    assert(narrow.subsetOf(wide))
    // hash-uniform: each slice within 40% of its expectation at n=2000
    val n = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("test") - 400) < 160, s"test slice: ${n("test")}")
    assert(math.abs(n("validation") - 200) < 80, s"val slice: ${n("validation")}")
    // invalid sizes refused
    intercept[IllegalArgumentException] {
      SamplingOps.assignSplit(ids, "id", 600, 500)
    }
  }

  test("shardLayout: dense per-shard positions in hash order, bounded shards") {
    val ids = spark.range(0, 500).toDF("id")
    val rows = SamplingOps.shardLayout(ids, "id", 4)
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect()
    assert(rows.length == 500)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 4 })
    // positions are dense 0..n_s-1 within every shard
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $s positions not dense")
    }
    // position order IS hash order (reading in position order interleaves)
    val h = (id: Long) => java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"shard:$id").take(8), 16)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._3).map(_._1).toSeq
      val byHash = rs.sortBy(r => (h(r._1), r._1)).map(_._1).toSeq
      assert(byPos == byHash)
    }
  }

  test("writeShards: partition-pruned single-shard read, dense ordered positions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val ids = spark.range(0, 300).toDF("id")
    SamplingOps.writeShards(ids, "id", 4, dir)
    val one = spark.read.parquet(dir).filter(col("shard") === 2)
    val scan = one.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    // the shard filter must land in PartitionFilters (pruned at source)
    assert(scan.contains("PartitionFilters: [") && scan.contains("= 2)"), scan)
    val pos = one.select("shard_pos").as[Long].collect().sorted.toSeq
    assert(pos == (0L until pos.length).toSeq)
    // nothing lost across shards
    assert(spark.read.parquet(dir).count() == 300)
    assert(spark.read.parquet(dir).select("id").distinct().count() == 300)
  }

  test("contaminationScore: exact fractions, zero-overlap kept, short docs excluded") {
    val train = Seq(
      (1L, "a b c d e"),   // shingles abc bcd cde (3 distinct)
      (2L, "x y z w"),     // xyz yzw — no overlap
      (3L, "a b"),         // < k tokens → excluded
      (4L, "a b c a b c a b c")) // 7 shingle positions, 3 distinct incl 'c a b'...
      .toDF("doc_id", "text")
    val bench = Seq((90L, "a b c d q")).toDF("doc_id", "text") // abc bcd cdq
    val out = TextOps.contaminationScore(train, bench, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 3 && out(1L)._2 == 2) // abc, bcd hit; cde not
    assert(out(1L)._3 == 2.0 / 3.0)
    assert(out(2L) == ((2L, 0L, 0.0)))
    // doc 4: distinct shingles {abc, bca, cab, abc...} = abc,bca,cab... only 'abc' in bench
    assert(out(4L)._2 == 1 && out(4L)._3 == 1.0 / out(4L)._1)
  }

  test("normalizeText collapses case, punctuation and whitespace runs") {
    val df = Seq(
      ("Hello,   World!!", "hello world"),
      ("  spark--scala__4 ", "spark scala 4"),
      ("already canonical", "already canonical"),
      ("!!!", ""))
      .toDF("raw", "expected")
    val bad = df.filter(TextOps.normalizeText(col("raw")) =!= col("expected"))
    assert(bad.count() == 0)
    // canonical dedup collapses re-encoded copies
    val docs = Seq((1L, "the quick fox"), (2L, "The  QUICK fox!"), (3L, "other doc"))
      .toDF("doc_id", "text")
    val kept = DedupOps.dedupExact(
        docs.withColumn("c", TextOps.normalizeText(col("text"))), "c", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("normalizeText: idempotent with a closed output alphabet on random strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ 019!@#_-\t.()"
    val strs = (1 to 300).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = strs.toDF("raw")
      .withColumn("n1", TextOps.normalizeText(col("raw")))
      .withColumn("n2", TextOps.normalizeText(TextOps.normalizeText(col("raw"))))
    assert(df.filter(col("n1") =!= col("n2")).count() == 0)
    // canonical alphabet: lowercase alnum + single interior spaces, trimmed
    assert(df.filter(col("n1").rlike("[^a-z0-9 ]") ||
      col("n1").rlike("  ") || col("n1") =!= trim(col("n1"))).count() == 0)
  }

  test("distinctiveTerms: rarity-first ranking with tf and lexicographic ties") {
    val docs = Seq(
      (1L, "common rare1 common common"),  // df(common)=3, df(rare1)=1
      (2L, "common rare2 rare2"),
      (3L, "common zebra apple"))          // zebra/apple both df=1 tf=1 → lexicographic
      .toDF("doc_id", "text")
    val out = TextOps.distinctiveTerms(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getString(1)).toMap
    assert(out((1L, 1L)) == "rare1")   // df 1 beats common's df 3 despite tf 3
    assert(out((1L, 2L)) == "common")
    assert(out((2L, 1L)) == "rare2")
    assert(out((3L, 1L)) == "apple")   // df tie, tf tie → lexicographic
    assert(out((3L, 2L)) == "zebra")
    // k bound respected
    assert(TextOps.distinctiveTerms(docs, "text", "doc_id", 1)
      .groupBy("doc_id").count().select(max("count")).as[Long].head() == 1L)
  }

  test("annRecall: perfect, partial, and empty approximate results") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    // q1 fully recovered, q2 half, q3 missed entirely
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val r = SimilarityOps.annRecall(approx, exact)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(r(1L) == ((2L, 2L, 1000L)))
    assert(r(2L) == ((2L, 1L, 500L)))
    assert(r(3L) == ((1L, 0L, 0L)))
  }

  test("annRecall: duplicate (query, neighbor) rows do not inflate recall") {
    val exact = Seq((1L, 10L), (1L, 10L), (1L, 11L)) // dup ground-truth row
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 10L)) // dup approx rows
      .toDF("query_id", "neighbor_id")
    val r = SimilarityOps.annRecall(approx, exact)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // without dedup the join fans out: n_exact 4, n_hit 3+ — recall wrong
    assert(r(1L) == ((2L, 1L, 500L)))
  }

  test("nearDupAgainstIndex: flags signature-agreeing batch docs, survivors kept") {
    val snapshot = Seq(
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (6L, "")) // empty → excluded from the index
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"), // exact copy of 2 → 12/12 agreement
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8"), // nothing like it
      (5L, ""))                         // empty → excluded from banding
      .toDF("doc_id", "text")
    val idx = DedupOps.minhashSigIndex(snapshot, "text", "doc_id", 3, 12)
    assert(idx.count() == 2) // empty doc 6 not indexed
    val flagged = DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id",
        3, 12, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(flagged == Set((1L, 2L, 12L)))
    val kept = DedupOps.dedupNearAgainstIndex(batch, idx, "text", "doc_id",
        3, 12, 4, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("nearDupAgainstStoredIndex: stored-key screen == recomputed-key screen") {
    val snapshot = Seq(
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (8L, "w1 w2 w3 w4 w5 w6 w7 different"), // near (not exact) copy of 2
      (6L, ""))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8"),
      (5L, ""))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_idx_spec").toString
    DedupOps.writeMinhashIndex(snapshot, "text", "doc_id", dir, 3, 12, 4)
    // the artifact's relations exist and the geometry is pinned; the
    // derived relations live in the meta-pointed epoch directory
    val meta = DedupOps.readMinhashIndexMeta(spark, dir)
    val ddir = DedupOps.minhashDerivedDir(dir, meta.epoch)
    assert((meta.shingleK, meta.numHashes, meta.bands) == ((3, 12, 4)))
    assert(meta.epoch == 0L && meta.sigCount == 3L)
    assert(storedSigs(dir).count() == 3) // empty doc 6 excluded
    val keyRows = spark.read.parquet(s"$ddir/bandkeys")
      .select("band_idx", "band_hash", "freq").collect()
    assert(keyRows.map(_.getLong(2)).sum == 3 * 4) // 3 docs × 4 bands, freqs total
    // the stored bloom bitmap covers the whole default word range and
    // matches a fresh build over the stored keys bit for bit
    assert((meta.bloomBits, meta.bloomHashes) == ((1 << 20, 4)))
    val storedBloom = spark.read.parquet(s"$ddir/bloom")
      .orderBy("word_idx").select("word").collect().map(_.getLong(0))
    assert(storedBloom.length == (1 << 20) / 64)
    val rebuilt = graft.functions.BloomFilter.build(
      spark.read.parquet(s"$ddir/bandkeys")
        .select(org.apache.spark.sql.functions.xxhash64(
          col("band_idx"), col("band_hash")).as("__bk")),
      "__bk", 1 << 20, 4)
    assert(java.util.Arrays.equals(storedBloom, rebuilt))
    // stored path ≡ in-memory path, row for row (geometry from meta only)
    val idx = DedupOps.minhashSigIndex(snapshot, "text", "doc_id", 3, 12)
    val recomputed = DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id",
        3, 12, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = DedupOps.nearDupAgainstStoredIndex(spark, dir, batch,
        "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == recomputed)
    assert(stored.map(_._1) == Set(1L)) // and both flag exactly doc 1
  }

  test("appendMinhashIndex: append == one-shot build, relation for " +
    "relation and bloom bit for bit; geometry comes from meta") {
    val day1 = Seq((2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val day2 = Seq((6L, "m1 m2 m3 m4 m5 m6 m7 m8"),
      (8L, "w1 w2 w3 w4 w5 w6 w7 different")).toDF("doc_id", "text")
    val appended = java.nio.file.Files.createTempDirectory("graft_mh_app").toString
    val oneShot = java.nio.file.Files.createTempDirectory("graft_mh_one").toString
    DedupOps.writeMinhashIndex(day1, "text", "doc_id", appended, 3, 12, 4)
    DedupOps.appendMinhashIndex(spark, appended, day2, "text", "doc_id")
    DedupOps.writeMinhashIndex(day1.union(day2), "text", "doc_id",
      oneShot, 3, 12, 4)
    def sigs(d: String) = storedSigs(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def ddir(d: String) = DedupOps.minhashDerivedDir(d,
      DedupOps.readMinhashIndexMeta(spark, d).epoch)
    def keys(d: String) = spark.read.parquet(s"${ddir(d)}/bandkeys")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def bloom(d: String) = spark.read.parquet(s"${ddir(d)}/bloom")
      .orderBy("word_idx").collect().map(_.getLong(1)).toSeq
    // the append took the DELTA-MERGE path (epoch advanced, not rebuilt)
    // and still matches the one-shot build exactly
    assert(DedupOps.readMinhashIndexMeta(spark, appended).epoch == 1L)
    assert(DedupOps.readMinhashIndexMeta(spark, appended).sigCount == 4L)
    assert(sigs(appended) == sigs(oneShot) && sigs(appended).size == 4)
    assert(keys(appended) == keys(oneShot))
    assert(bloom(appended) == bloom(oneShot))
    // a RE-DROPPED segment is an idempotent no-op: the id anti-join
    // skips already-signed docs before any text is shingled — without
    // it, the duplicate rows would inflate sig_count, double the
    // band-key frequencies, and double-emit the segment's candidates
    DedupOps.appendMinhashIndex(spark, appended, day2, "text", "doc_id")
    assert(DedupOps.readMinhashIndexMeta(spark, appended).sigCount == 4L,
      "re-appending an indexed segment must add zero signatures")
    assert(sigs(appended) == sigs(oneShot))
    assert(keys(appended) == keys(oneShot))
    assert(bloom(appended) == bloom(oneShot))
    // and a probe over the appended artifact flags against BOTH days
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (13L, "m1 m2 m3 m4 m5 m6 m7 m8")).toDF("doc_id", "text")
    val flagged = DedupOps.nearDupAgainstStoredIndex(spark, appended,
        batch, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.contains((11L, 2L)) && flagged.contains((13L, 6L)))
  }

  test("minhash index epochs: immutable derived dirs, one-append grace " +
    "for in-flight probes, older epochs pruned") {
    def day(ids: Seq[Long], p: String) =
      ids.map(i => (i, s"$p$i a b c d e f g h")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_epoch").toString
    def exists(e: Long) =
      new java.io.File(DedupOps.minhashDerivedDir(dir, e)).exists()
    DedupOps.writeMinhashIndex(day(Seq(2L), "w"), "text", "doc_id", dir, 3, 12, 4)
    assert(exists(0))
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(4L), "x"), "text", "doc_id")
    // e0 survives the append that superseded it (a probe that resolved
    // epoch 0 before the append keeps its consistent snapshot)...
    assert(exists(0) && exists(1))
    assert(DedupOps.readMinhashIndexMeta(spark, dir).epoch == 1L)
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(6L), "y"), "text", "doc_id")
    // ...and is pruned by the NEXT append
    assert(!exists(0) && exists(1) && exists(2))
  }

  test("appendMinhashIndex: a torn append's orphan epoch is invisible " +
    "and the retried append replaces it — retry + next day ends " +
    "byte-identical to the one-shot build") {
    val day1 = Seq((2L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val day2 = Seq((4L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val day3 = Seq((6L, "m1 m2 m3 m4 m5 m6 m7 m8")).toDF("doc_id", "text")
    val healed = java.nio.file.Files.createTempDirectory("graft_mh_heal").toString
    val oneShot = java.nio.file.Files.createTempDirectory("graft_mh_heal1").toString
    DedupOps.writeMinhashIndex(day1, "text", "doc_id", healed, 3, 12, 4)
    // simulate a crash mid-append: day2's signature epoch dir landed,
    // but the derived epoch + meta swap never ran — the orphan sits
    // OUTSIDE the meta window, so probes and counts never see it
    DedupOps.minhashSigIndex(day2, "text", "doc_id", 3, 12)
      .select(col("doc_id").as("id"), col("sig"))
      .write.mode("overwrite").parquet(DedupOps.minhashSigDir(healed, 1L))
    assert(DedupOps.readMinhashIndexMeta(spark, healed).sigCount == 1L)
    assert(storedSigs(healed).count() == 1L,
      "an unswapped epoch must be invisible")
    // the orchestrator RETRIES day2 (the torn batch), which overwrites
    // the orphan dir wholesale, then day3 proceeds normally
    DedupOps.appendMinhashIndex(spark, healed, day2, "text", "doc_id")
    DedupOps.appendMinhashIndex(spark, healed, day3, "text", "doc_id")
    DedupOps.writeMinhashIndex(day1.union(day2).union(day3), "text",
      "doc_id", oneShot, 3, 12, 4)
    def ddir(d: String) = DedupOps.minhashDerivedDir(d,
      DedupOps.readMinhashIndexMeta(spark, d).epoch)
    def keys(d: String) = spark.read.parquet(s"${ddir(d)}/bandkeys")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def bloom(d: String) = spark.read.parquet(s"${ddir(d)}/bloom")
      .orderBy("word_idx").collect().map(_.getLong(1)).toSeq
    assert(DedupOps.readMinhashIndexMeta(spark, healed).sigCount == 3L)
    assert(storedSigs(healed).filter(col("id") === 4L).count() == 1L,
      "the retried day must land exactly once")
    assert(keys(healed) == keys(oneShot))
    assert(bloom(healed) == bloom(oneShot))
  }

  test("compactMinhashIndex: build -> appends -> compact leaves the " +
    "probe byte-identical, re-bases the window onto one file-set, and " +
    "the next compaction prunes the superseded generation") {
    def day(ids: Seq[Long], tok: String) =
      ids.map(i => (i, s"${tok}1 ${tok}2 ${tok}3 ${tok}4 ${tok}5 ${tok}6"))
        .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_cmp").toString
    DedupOps.writeMinhashIndex(day(Seq(2L), "w"), "text", "doc_id", dir, 3, 12, 4)
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(4L), "x"), "text", "doc_id")
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(6L), "y"), "text", "doc_id")
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6"), (13L, "y1 y2 y3 y4 y5 y6"))
      .toDF("doc_id", "text")
    def probe() = DedupOps.nearDupAgainstStoredIndex(spark, dir, batch,
        "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def sigEpochs() =
      Option(new java.io.File(s"$dir/signatures").listFiles()).toSeq.flatten
        .map(_.getName).filter(_.startsWith("e")).toSet
    def windowFiles(): Int = {
      val m = DedupOps.readMinhashIndexMeta(spark, dir)
      (m.sigBase to m.epoch).map { e =>
        Option(new java.io.File(DedupOps.minhashSigDir(dir, e)).listFiles())
          .toSeq.flatten.count(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
      }.sum
    }
    val before = probe()
    assert(before.map(_._1) == Set(11L, 13L))
    assert(sigEpochs() == Set("e0", "e1", "e2"))
    // below the policy threshold nothing happens; at it, compaction runs
    assert(!DedupOps.maybeCompactMinhashIndex(spark, dir, 4))
    assert(DedupOps.maybeCompactMinhashIndex(spark, dir, 3))
    val m = DedupOps.readMinhashIndexMeta(spark, dir)
    assert(m.epoch == 3L && m.sigBase == 3L && m.sigCount == 3L)
    assert(probe() == before, "compaction must not change probe output")
    assert(windowFiles() == 1,
      "the visible window must be one file-set after compaction")
    // one generation's grace, then the NEXT compaction prunes it
    assert(sigEpochs() == Set("e0", "e1", "e2", "e3"))
    DedupOps.appendMinhashIndex(spark, dir, day(Seq(8L), "z"), "text", "doc_id")
    DedupOps.compactMinhashIndex(spark, dir)
    assert(sigEpochs() == Set("e3", "e4", "e5"), s"got ${sigEpochs()}")
    assert(probe() == before,
      "the original probe rows survive re-base and prune")
  }

  test("maskRepeatedSpans: masks every token of each hot k-gram, " +
    "untouched docs pass through byte-identical") {
    val df = Seq(
      (1L, "a b c x y"), // "a b c" also in doc 2 -> hot
      (2L, "p q a b c"),
      (3L, "u v w x y"), // no cross-doc 3-gram -> untouched bypass
      (4L, ""))          // < k tokens -> no spans at all
      .toDF("doc_id", "text")
    val out = TextOps.maskRepeatedSpans(df, "text", "doc_id", 3, 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((5L, 3L, "<DUP> <DUP> <DUP> x y")))
    assert(out(2L) == ((5L, 3L, "p q <DUP> <DUP> <DUP>")))
    assert(out(3L) == ((5L, 0L, "u v w x y")))
    assert(out(4L) == ((1L, 0L, ""))) // empty text = one empty token
  }

  test("maskRepeatedSpans: the shingle kernel runs exactly once — the " +
    "checkpointed span relation feeds both consumers") {
    val df = Seq((1L, "a b c x"), (2L, "a b c y")).toDF("doc_id", "text")
    val out = TextOps.maskRepeatedSpans(df, "text", "doc_id", 3, 2L)
    // the kernel ran at checkpoint time; the downstream plan must hold
    // ZERO TokenShingleHash expressions (a second occurrence = a second
    // full corpus text pass at 100 TB)
    var hits = 0
    out.queryExecution.optimizedPlan.foreach(node =>
      node.expressions.foreach(_.foreach {
        case _: graft.functions.TokenShingleHash => hits += 1
        case _ => ()
      }))
    assert(hits == 0, s"span-hash kernel appears $hits times downstream of the checkpoint")
  }

  test("maskRepeatedSpans: within-doc repetition counts toward minFreq, " +
    "overlapping spans union their coverage") {
    val df = Seq(
      (1L, "s t u v s t u v"), // "s t u" and "t u v" each occur twice
      (2L, "m n o"))
      .toDF("doc_id", "text")
    val out = TextOps.maskRepeatedSpans(df, "text", "doc_id", 3, 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // coverage: starts {0,4} + {1,5}, k=3 -> positions 0..3 ∪ 4..7 = all
    assert(out(1L) == ((8L, 8L,
      "<DUP> <DUP> <DUP> <DUP> <DUP> <DUP> <DUP> <DUP>")))
    assert(out(2L) == ((3L, 0L, "m n o")))
    // reserved-column guard, same discipline as snapshotDiff
    val clash = df.withColumn("__ms_pos", lit(1))
    val e = intercept[IllegalArgumentException] {
      TextOps.maskRepeatedSpans(clash, "text", "doc_id", 3, 2L)
    }
    assert(e.getMessage.contains("reserved columns"))
  }

  test("hashedBowFeatures: per-bucket counts, sparse, empty/null text empty") {
    import graft.functions.StringPolyHash
    val df = Seq((1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.hashedBowFeatures(df, "text", "doc_id", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(t: String): Long = StringPolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)) % 64
    assert(got == Map((1L, bucket("a")) -> 2L, (1L, bucket("b")) -> 1L))
  }

  test("winnowFingerprints: window minima dedup'd per doc, the shared-run " +
    "guarantee holds, short docs degrade to a single min") {
    import graft.functions.StringPolyHash
    val df = Seq(
      (1L, "a b c d e f g h"),       // 6 shingles (k=3), 3 windows (w=4)
      (2L, "x y a b c d e f q r"),   // shares the 6-token run "a b c d e f"
      (3L, "p q r"),                 // exactly 1 shingle < w -> global min
      (4L, "s t"),                   // < k tokens -> no shingles -> no rows
      (5L, ""))                      // empty -> no rows
      .toDF("doc_id", "text")
    val got = TextOps.winnowFingerprints(df, "text", "doc_id", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // independent arithmetic: shingle hashes via the same public fold
    def shingles(text: String): Vector[Long] = {
      val th = text.split(" ").toVector
        .map(t => StringPolyHash.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      if (th.length < 3) Vector.empty
      else (0 to th.length - 3).toVector
        .map(i => th.slice(i, i + 3).foldLeft(0L)((a, h) => (a * 31 + h) % 1000000007L))
    }
    def winnow(text: String): Set[Long] = {
      val hs = shingles(text)
      if (hs.isEmpty) Set.empty
      else if (hs.length < 4) Set(hs.min)
      else (0 to hs.length - 4).map(i => hs.slice(i, i + 4).min).toSet
    }
    assert(got.getOrElse(4L, Set.empty[Long]).isEmpty)
    assert(got.getOrElse(5L, Set.empty[Long]).isEmpty)
    assert(got(1L) == winnow("a b c d e f g h"))
    assert(got(2L) == winnow("x y a b c d e f q r"))
    assert(got(3L) == winnow("p q r") && got(3L).size == 1)
    // the winnowing guarantee: a shared w+k-1 = 6-token run -> shared fp
    assert((got(1L) intersect got(2L)).nonEmpty)
    // and doc 3 shares nothing with either
    assert((got(3L) intersect (got(1L) ++ got(2L))).isEmpty)
  }

  test("topKVocabByGroup: per-group ranks, ties lexicographic, k bound") {
    val docs = Seq(
      ("s1", "a a a b b c"),
      ("s1", "b"),
      ("s2", "x y"))
      .toDF("source", "text")
    val out = TextOps.topKVocabByGroup(docs, Seq("source"), "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(("s1", 1L)) == (("a", 3L))) // a×3
    assert(out(("s1", 2L)) == (("b", 3L))) // b×3, lexicographic after a
    assert(out(("s2", 1L)) == (("x", 1L))) // x/y tie → lexicographic
    assert(out(("s2", 2L)) == (("y", 1L)))
    assert(out.size == 4) // k bound per group
  }

  test("withQuantileBin: quartile labels from data-derived cutoffs, null metric -> null bin") {
    // values 1..100 → p250=25, p500=50, p750=75
    val df = spark.range(1, 101).toDF("v")
      .unionByName(Seq(Option.empty[Long]).toDF("v"))
    val out = StatsOps.withQuantileBin(df, col("v"), Seq(250, 500, 750))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(Some(1L)) == Some(0L))
    assert(out(Some(24L)) == Some(0L))
    assert(out(Some(25L)) == Some(1L))   // at the cutoff → next bin
    assert(out(Some(50L)) == Some(2L))
    assert(out(Some(75L)) == Some(3L))
    assert(out(Some(100L)) == Some(3L))
    assert(out(None).isEmpty)            // null metric → null bin
  }

  test("lengthBucketedBatches: bounded batches, in-band lengths, dense positions, guards") {
    val df = spark.range(0, 200).toDF("id")
      .withColumn("n_tok", (col("id") * 7) % 100)
    val out = PackingOps.lengthBucketedBatches(df, "id", "n_tok",
        bucketWidth = 10, batchSize = 4, shards = 2)
      .select("id", "n_tok", "len_bucket", "shard", "batch_idx", "batch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 200)
    // every batch holds at most batchSize docs with positions 0..m-1,
    // and all its members share the length band
    out.groupBy(t => (t._3, t._4, t._5)).foreach { case (key, rs) =>
      assert(rs.length <= 4, s"batch $key overfull")
      assert(rs.map(_._6).sorted.toSeq == (0L until rs.length).toSeq)
      assert(rs.map(_._2 / 10).distinct.length == 1)
    }
    // negative and null token counts fail loudly
    val neg = Seq((1L, -5L)).toDF("id", "n_tok")
    val e = intercept[Exception] {
      PackingOps.lengthBucketedBatches(neg, "id", "n_tok", 10, 4).collect()
    }
    assert(e.getMessage.contains("lengthBucketedBatches") ||
      e.getCause != null)
  }

  test("lengthBucketedBatches: a modal length band spreads across shards") {
    // the real-corpus hazard: everyone writes ~same-length docs — one
    // band holds the whole corpus and must still parallelize by shard
    val df = spark.range(0, 1000).toDF("id").withColumn("n_tok", lit(50L))
    val out = PackingOps.lengthBucketedBatches(df, "id", "n_tok",
        bucketWidth = 16, batchSize = 10, shards = 4)
      .groupBy("len_bucket", "shard").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keys.map(_._1).toSet == Set(3L)) // one band (50 div 16)
    assert(out.size == 4)                       // ...but all 4 shards populated
    // hash-uniform: each shard within 40% of the 250 expectation
    out.values.foreach(c => assert(math.abs(c - 250) < 100, out.toString))
  }

  test("dupStatsByGroup: per-group doc/distinct/dup counts and rates") {
    val df = Seq(
      ("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "x"), ("s2", "y"))
      .toDF("source", "text")
    val out = DedupOps.dupStatsByGroup(df, Seq("source"), "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("s1") == ((4L, 3L, 1L, 0.25)))
    assert(out("s2") == ((2L, 2L, 0L, 0.0)))
  }

  test("boilerplateScore: corpus-common shingles flagged, unique docs score zero") {
    // "x y z" appears in 3 docs (the boilerplate); doc 4 is all-unique
    val docs = Seq(
      (1L, "x y z a b"),   // shingles xyz yza zab
      (2L, "x y z c d"),
      (3L, "p q x y z"),
      (4L, "m n o r s"))
      .toDF("doc_id", "text")
    val out = TextOps.boilerplateScore(docs, "text", "doc_id", 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0))) // only xyz is common to 3 docs
    assert(out(2L)._2 == 1L)
    assert(out(3L)._2 == 1L)
    assert(out(4L) == ((3L, 0L, 0.0)))
  }

  test("momentsByGroup: integer-exact mean/variance, nulls excluded") {
    val df = Seq(("a", Some(2L)), ("a", Some(4L)), ("a", Some(6L)),
      ("a", None), ("b", Some(5L)))
      .toDF("g", "v")
    val out = StatsOps.momentsByGroup(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") == ((3L, 12L, 4.0, 8.0 / 3.0))) // var = (3·56−144)/9 = 24/9
    assert(out("b") == ((1L, 5L, 5.0, 0.0)))
  }

  test("histogram: fixed-width buckets, bounds, negative rejection") {
    val df = Seq(0L, 1L, 9L, 10L, 15L, 20L, 99L).toDF("v")
    val out = StatsOps.histogram(df, col("v"), 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L) == ((0L, 10L, 3L)))
    assert(out(1L) == ((10L, 20L, 2L)))
    assert(out(2L) == ((20L, 30L, 1L)))
    assert(out(9L) == ((90L, 100L, 1L)))
    val e = intercept[Exception] {
      StatsOps.histogram(Seq(-1L).toDF("v"), col("v"), 10).collect()
    }
    assert(e.getMessage.contains("histogram") || e.getCause != null)
  }

  test("meanPoolByGroup: exact floor-mean centroids incl. negative rounding") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(2.0f, 3.0f)),      // mean → (1500, 2500)
      (2, Seq(-0.0011f, 0.0f)), (2, Seq(0.0f, 0.0f)))  // dim0 sum -1, n 2 → FLOOR -1
      .toDF("label", "embedding")
    val out = SimilarityOps.meanPoolByGroup(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(out(1) == ((Seq(1500L, 2500L), 2L)))
    // floor(-0.5) = -1, not truncate-to-zero — the cross-engine contract
    assert(out(2) == ((Seq(-1L, 0L), 2L)))
  }

  test("meanPoolByGroup: mixed vector lengths in a group fail loudly") {
    val df = Seq((1, Seq(1.0f, 2.0f)), (1, Seq(3.0f)))
      .toDF("label", "embedding")
    val e = intercept[Exception] {
      SimilarityOps.meanPoolByGroup(df, "label", "embedding").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("in the same group")),
      chain(e).mkString(" | ")) // LongVectorSum's loud length guard
  }

  test("ivfPqTopK: probed ADC ranking stays within the query's cluster") {
    // two orthogonal clusters; PQ + IVF must rank a same-cluster vector first
    val rows = (0 until 40).map { i =>
      val v =
        if (i % 2 == 0) Seq(1.0f + i * 0.001f, 0.002f, 0.0f, 0.0f)
        else Seq(0.0f, 0.0f, 1.0f + i * 0.001f, 0.003f)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cbs = SimilarityOps.pqCodebooks(df, "vec_id", "embedding",
      numSubspaces = 2, numCodes = 8, stride = 3)
    val out = SimilarityOps.ivfPqTopK(
        df.filter(col("vec_id") === 2), df, "vec_id", "embedding", 3, cbs,
        centroidStride = 7, nProbes = 2)
      .orderBy(col("cosine").desc, col("neighbor_id")).collect()
    assert(out.nonEmpty)
    // the top hit is another EVEN (same-cluster) vector
    assert(out.head.getLong(1) % 2 == 0, out.map(_.toString).mkString(","))
    // deterministic across evaluations
    val again = SimilarityOps.ivfPqTopK(
        df.filter(col("vec_id") === 2), df, "vec_id", "embedding", 3, cbs,
        centroidStride = 7, nProbes = 2)
      .orderBy(col("cosine").desc, col("neighbor_id")).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("filterCorpus: gate + data-derived cutoff + dedup in one pass") {
    // en docs of varying length, one exact dup pair, one de doc
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a fine day for all of us here"),
      (2L, "the dog ran fast and it is a good day for the young dog today ok"),
      (3L, "the dog ran fast and it is a good day for the young dog today ok"),
      (4L, "the a of"), // short — below any length cutoff of the survivors
      (5L, "der hund und die katze und das haus und der baum und das auto ist"))
      .toDF("doc_id", "text")
    val out = CorpusFilter.filterCorpus(docs, "text", "doc_id",
        langCode = "en", minQuality = 0.0, minTokPermille = 500)
      .select("doc_id").as[Long].collect().toSet
    // 5 is de; 3 is a dup of 2; 4 falls below the p50 token cutoff
    assert(out == Set(1L, 2L))
    // empty post-gate corpus yields an empty result, not a crash
    val none = CorpusFilter.filterCorpus(docs, "text", "doc_id",
      langCode = "fr", minQuality = 0.0, minTokPermille = 500)
    assert(none.count() == 0)
  }

  test("filterCorpus: cutoff histogram above the cardinality cap fails loudly") {
    // 4 distinct token counts among the en survivors, cap of 2 → the
    // bounded-collect contract is violated and must raise, not collect
    val docs = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "the cat sat on the mat today again and"),
      (3L, "the cat sat on the mat today again and then some more"),
      (4L, "the cat sat on the mat today again and then some more after all of it"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusFilter.filterCorpus(docs, "text", "doc_id",
        langCode = "en", minQuality = 0.0, minTokPermille = 500,
        maxCutoffHistogram = 2)
    }
    assert(e.getMessage.contains("cutoff histogram exceeds 2"))
    // at the default cap the same corpus flows through untouched
    assert(CorpusFilter.filterCorpus(docs, "text", "doc_id",
      langCode = "en", minQuality = 0.0, minTokPermille = 1).count() == 4)
  }
}
