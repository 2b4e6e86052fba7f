package graft.streaming

import graft.SparkTestSession
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode}
import org.scalatest.funsuite.AnyFunSuite

class PipelineStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streaming exact dedup keeps first arrival across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.dedupExactStream(sdf, "text", "event_time", "10 seconds")
    val query = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha", ts(10)), (2L, "beta", ts(11)), (3L, "alpha", ts(12)))
      query.processAllAvailable()
      mem.addData((4L, "alpha", ts(13)), (5L, "gamma", ts(14)), (6L, "beta", ts(15)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("dedup_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // one row per distinct content, the first arrival: alpha->1, beta->2, gamma->5
    assert(got == Seq(1L, 2L, 5L))
  }

  test("windowed counts with watermark emit closed windows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Timestamp)]
    val sdf = mem.toDF.toDF("event_type", "value", "event_time")
    val out = PipelineStreams.windowedCounts(
      sdf, "event_time", "event_type", "value", "10 seconds", "5 seconds")
    val query = out.writeStream.format("memory").queryName("win_stream")
      .outputMode("append").start()
    try {
      mem.addData(("click", 1.5, ts(1)), ("click", 2.5, ts(3)), ("view", 1.0, ts(8)))
      query.processAllAvailable()
      // advance event time far past the first window + watermark -> closes it
      mem.addData(("click", 9.0, ts(60)))
      query.processAllAvailable()
      mem.addData(("view", 1.0, ts(120)))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("win_stream")
      .select("event_type", "n", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // first 10s window closed with click:2 (1.5+2.5) and view:1 (1.0);
    // the ts(60) window closed when ts(120) advanced the watermark
    assert(rows.contains(("click", 2L, 4.0)))
    assert(rows.contains(("view", 1L, 1.0)))
    assert(rows.contains(("click", 1L, 9.0)))
  }

  test("streaming session windows close on gap once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sdf = mem.toDF.toDF("user", "event_time")
    val out = PipelineStreams.sessionCounts(
      sdf, "event_time", "user", gap = "10 seconds", delay = "5 seconds")
    val query = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      mem.addData(("u1", ts(1)), ("u1", ts(5)), ("u1", ts(8)), ("u2", ts(2)))
      query.processAllAvailable()
      // far-future event moves the watermark past both open sessions
      mem.addData(("u1", ts(100)))
      query.processAllAvailable()
      mem.addData(("u1", ts(200)))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("sess_stream")
      .select("user", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // u1's first session has 3 events (1,5,8 within 10s gaps); u2 has 1;
    // u1@100 closed when 200 advanced the watermark
    assert(rows.contains(("u1", 3L)) && rows.contains(("u2", 1L)))
    assert(rows.contains(("u1", 1L)))
  }

  test("streaming corpus filter: gates + dedup compose on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.corpusFilterStream(
      sdf, "text", "event_time", "10 seconds",
      langCode = "en", minQuality = 25.0, minTokens = 5L)
    val query = out.writeStream.format("memory").queryName("cf_stream")
      .outputMode("append").start()
    val good = "the cat is on the mat and the dog is here watching it closely"
    val german = "der hund und die katze das ist und der und die das haus"
    try {
      mem.addData(
        (1L, good, ts(10)),
        (2L, german, ts(11)),      // language gate drops
        (3L, "the a", ts(12)),     // minTokens gate drops
        (4L, good, ts(13)))        // exact dup of 1 drops
      query.processAllAvailable()
    } finally query.stop()
    val kept = spark.table("cf_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L))
  }

  test("streaming near-dup candidates pair within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.nearDupCandidatesStream(
      sdf, "text", "doc_id", "event_time", "30 seconds")
    val query = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    try {
      // 1 and 2 are near-dups arriving 5s apart (inside the horizon);
      // 6 is the same text a full 10 minutes later (outside); 3 is
      // unrelated; 4 is empty (no shingles -> excluded from banding)
      mem.addData((1L, base, ts(10)), (2L, base + " x", ts(15)),
        (3L, "totally different content with many other words here", ts(12)),
        (4L, "", ts(13)))
      query.processAllAvailable()
      mem.addData((6L, base, ts(610)))
      query.processAllAvailable()
      mem.addData((7L, "advance watermark only zzz qqq www eee rrr", ts(1200)))
      query.processAllAvailable()
    } finally query.stop()
    val pairs = spark.table("neardup_stream")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
    assert(pairs.contains((1L, 2L)), s"in-horizon near-dup missed: $pairs")
    // the late exact dup must NOT pair with 1 or 2 (horizon passed)
    assert(!pairs.exists { case (a, b) => b == 6L && a <= 2L },
      s"out-of-horizon pair leaked: $pairs")
    // the empty doc never appears
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // unrelated docs don't pair with the near-dup cluster
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("streaming candidates == batch LSH pairs when all docs share the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.DedupOps
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog every day",
      2L -> "the quick brown fox jumps over the lazy dog every night",
      3L -> "a completely different document about spark physical plans",
      4L -> "a completely different document about spark logical plans",
      5L -> "nothing like the others at all in any conceivable way")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.nearDupCandidatesStream(
      sdf, "text", "doc_id", "event_time", "60 seconds")
    val query = out.writeStream.format("memory").queryName("nd_eq_stream")
      .outputMode("append").start()
    try {
      mem.addData(texts.zipWithIndex.map { case ((id, t), i) => (id, t, ts(10 + i)) }: _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("nd_eq_stream")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
    val batch = DedupOps.minhashCandidatePairs(
        texts.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical signature + banding arithmetic, and every doc is within
    // every other's horizon -> the candidate sets must be EQUAL
    assert(streamed == batch,
      s"stream=$streamed batch=$batch")
    assert(batch.nonEmpty) // the test must actually exercise pairing
  }

  test("document chunking runs unchanged on a stream (stateless map+generator)") {
    // chunkDocuments is shuffle- and state-free, so the BATCH operator is
    // its own streaming twin — no watermark, no output-mode constraint
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF.toDF("doc_id", "text")
    val out = graft.pipeline.PackingOps.chunkDocuments(sdf, "text", "doc_id", 4, 3)
    val query = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("chunk_stream")
      .select("doc_id", "chunk_idx", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "t1 t2 t3 t4"), (1L, 1L, "t4 t5 t6 t7"),
      (1L, 2L, "t7 t8 t9 t10"), (2L, 0L, "a b")))
  }

  test("canonical dedup stream collapses re-encoded copies to first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.canonicalDedupStream(sdf, "text", "event_time",
      "10 seconds")
    val query = out.writeStream.format("memory").queryName("canon_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "the quick fox", ts(10)),
        (2L, "The  QUICK fox!", ts(11)),    // canonical dup of 1 → dropped
        (3L, "another doc", ts(12)))
      query.processAllAvailable()
      mem.addData((4L, "THE QUICK FOX", ts(13)),  // still within horizon → dropped
        (5L, "a new doc", ts(14)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("canon_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L, 5L))
  }

  test("stream-static near-dup screen flags against the index exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val snapshot = Seq(
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
    val idx = graft.pipeline.DedupOps.minhashSigIndex(
      snapshot, "text", "doc_id", 3, 12)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.nearDupIndexFlagsStream(sdf, idx, "text",
      "doc_id", "event_time", "10 seconds", 3, 12, 4, 0.5)
    val query = out.writeStream.format("memory").queryName("ndidx_stream")
      .outputMode("append").start()
    try {
      mem.addData((11L, "w1 w2 w3 w4 w5 w6 w7 w8", ts(10)), // copy of 2
        (13L, "q1 q2 q3 q4 q5 q6 q7 q8", ts(11)),            // novel
        (15L, "", ts(12)))                                    // empty → unbanded
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("ndidx_stream")
      .select("new_id", "old_id", "n_agree").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exactly ONE flag row despite the copy colliding on all 4 bands
    assert(got == Seq((11L, 2L, 12L)))
    // batch twin agrees on the same data
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (13L, "q1 q2 q3 q4 q5 q6 q7 q8"), (15L, "")).toDF("doc_id", "text")
    val flaggedBatch = graft.pipeline.DedupOps.nearDupAgainstIndex(
        batch, idx, "text", "doc_id", 3, 12, 4, 0.5)
      .select(col("new_id"), col("old_id"), col("n_agree")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(flaggedBatch == got)
  }

  test("stored-index near-dup stream: bloom-prescreened flags match the " +
    "batch stored-index screen") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val snapshot = Seq(
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (8L, "w1 w2 w3 w4 w5 w6 w7 different"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_stream").toString
    graft.pipeline.DedupOps.writeMinhashIndex(snapshot, "text", "doc_id",
      dir, 3, 12, 4)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.nearDupStoredIndexFlagsStream(spark, dir, sdf,
      "text", "doc_id", "event_time", "10 seconds", 0.5)
    val query = out.writeStream.format("memory").queryName("ndstored_stream")
      .outputMode("append").start()
    try {
      mem.addData((11L, "w1 w2 w3 w4 w5 w6 w7 w8", ts(10)), // copy of 2
        (13L, "q1 q2 q3 q4 q5 q6 q7 q8", ts(11)))            // novel
      query.processAllAvailable()
      mem.addData((15L, "z1 z2 z3 z4 z5 z6 z7 z8", ts(12)), // copy of 4
        (17L, "", ts(13)))                                    // empty → unbanded
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("ndstored_stream")
      .select("new_id", "old_id", "n_agree").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch stored-index screen over the same union of arrivals
    val batch = Seq((11L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (13L, "q1 q2 q3 q4 q5 q6 q7 q8"),
      (15L, "z1 z2 z3 z4 z5 z6 z7 z8"), (17L, ""))
      .toDF("doc_id", "text")
    val flaggedBatch = graft.pipeline.DedupOps.nearDupAgainstStoredIndex(
        spark, dir, batch, "text", "doc_id", 0.5)
      .select(col("new_id"), col("old_id"), col("n_agree")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == flaggedBatch)
    // exact copies flag their snapshot doc; 11 also flags 8 (the
    // snapshot's near-copy of 2 — they share 5 of 6 shingles, enough
    // permutation minima agree), novel 13 and empty 17 flag nothing
    assert(streamed.map(t => (t._1, t._2)) ==
      Set((11L, 2L), (11L, 8L), (15L, 4L)))
    // and the exact copies agree on all 12 permutations
    assert(streamed.filter(t => t._1 == 11L && t._2 == 2L).head._3 == 12L)
    assert(streamed.filter(t => t._1 == 15L).head._3 == 12L)
  }

  test("mixture sampling runs unchanged on a stream (stateless map filter)") {
    implicit val sqlCtx = spark.sqlContext
    val rates = Map("web" -> 500, "code" -> 1000)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "source", "event_time")
    val out = graft.pipeline.SamplingOps.mixtureSample(sdf, "doc_id", "source",
      rates, defaultPermille = 0)
    val query = out.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      mem.addData((1 to 60).map(i =>
        (i.toLong, Seq("web", "code", "junk")(i % 3), ts(i))): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("mix_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions.{col, lit}
    val batch = graft.pipeline.SamplingOps.mixtureSample(
        spark.range(1, 61).toDF("doc_id")
          .withColumn("source", org.apache.spark.sql.functions.element_at(
            org.apache.spark.sql.functions.array(lit("web"), lit("code"), lit("junk")),
            (col("doc_id") % 3 + 1).cast("int"))),
        "doc_id", "source", rates, defaultPermille = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // all code docs kept (rate 1000), no junk docs kept (default 0)
    assert((1 to 60 by 3).map(_.toLong).forall(streamed.contains))
    assert((2 to 60 by 3).map(_.toLong).forall(i => !streamed.contains(i)))
  }

  test("split assignment runs unchanged on a stream (stateless map)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "event_time")
    val out = graft.pipeline.SamplingOps.assignSplit(sdf, "doc_id", 100, 200)
    val query = out.writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try {
      mem.addData((1 to 50).map(i => (i.toLong, ts(i))): _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("split_stream")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.pipeline.SamplingOps.assignSplit(
        spark.range(1, 51).toDF("doc_id"), "doc_id", 100, 200)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }

  test("token budget stream: exclusive-prefix admission across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val sdf = mem.toDF.toDF("source", "doc_id", "n_tokens")
    val out = PipelineStreams.tokenBudgetStream(sdf, "source", "doc_id",
      "n_tokens", budget = 10L)
    val query = out.writeStream.format("memory").queryName("budget_stream")
      .outputMode("append").start()
    try {
      // batch 1: s1 admits 1 (used 4) and 2 (used 4 < 10 → overshoot to 12)
      mem.addData(("s1", 1L, 4L), ("s1", 2L, 8L), ("s2", 10L, 3L))
      query.processAllAvailable()
      // batch 2: s1 is exhausted (12 >= 10) → 3 rejected; s2 still open
      mem.addData(("s1", 3L, 1L), ("s2", 11L, 9L))
      query.processAllAvailable()
      // batch 3: s2 now exhausted (12 >= 10) → 12 rejected
      mem.addData(("s2", 12L, 5L))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("budget_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // s2: 10 (used 3), 11 (3 < 10 → used 12), 12 rejected
    assert(got == Seq(1L, 2L, 10L, 11L))
  }

  test("token budget stream: null id fails loudly, not with an encoder NPE") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Option[Long], Long)]
    val sdf = mem.toDF.toDF("source", "doc_id", "n_tokens")
    val out = PipelineStreams.tokenBudgetStream(sdf, "source", "doc_id",
      "n_tokens", budget = 10L)
    val query = out.writeStream.format("memory").queryName("budget_null_stream")
      .outputMode("append").start()
    val e = intercept[Exception] {
      try {
        mem.addData(("s1", Some(1L), 2L), ("s1", None, 3L))
        query.processAllAvailable()
      } finally query.stop()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("null doc_id")))
  }

  test("bloom contamination pre-screen: stateless flags, no false negatives") {
    implicit val sqlCtx = spark.sqlContext
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val benchSh = bench.select(
      explode(graft.functions.TokenShingleHash.shingleHashes(col("text"), 3))
        .as("sh")).distinct()
    val numBits = 1 << 12
    val bits = graft.functions.BloomFilter.build(benchSh, "sh", numBits, 4)

    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF.toDF("doc_id", "text")
    val out = PipelineStreams.contaminationFlagsStream(
      sdf, bits, "text", "doc_id", shingleK = 3, minOverlap = 5L,
      numHashes = 4, numBits = numBits)
    val query = out.writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (10L, benchText),                                  // exact copy: must flag
        (11L, "totally unrelated words that share nothing with anything else"),
        (12L, s"prefix words then $benchText and a suffix")) // embedded copy: must flag
      query.processAllAvailable()
    } finally query.stop()
    val flagged = spark.table("contam_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the hard contract is no false negatives; over-flagging is allowed
    // in principle (bloom fpp) but needs ≥5 accidental hits on a 4k-bit
    // map — not happening, so assert the clean doc stays clean too
    assert(flagged.contains(10L) && flagged.contains(12L),
      s"contaminated docs missing from $flagged")
    assert(!flagged.contains(11L), s"clean doc over-flagged: $flagged")
  }

  test("windowed dedup re-admits content in later windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.dedupExactStreamWindowed(
      sdf, "text", "event_time", "5 seconds", "10 seconds")
    val query = out.writeStream.format("memory").queryName("dedup_win_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha", ts(1)), (2L, "alpha", ts(3)),   // same window: dup
        (3L, "alpha", ts(15)))                                   // next window: kept
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("dedup_win_stream")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("upsert view: latest version wins, tombstones drop, " +
    "stale and replayed deltas are silent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Boolean, Long)]
    val sdf = mem.toDF.toDF("doc_id", "ver", "deleted", "dig")
    val out = PipelineStreams.upsertViewStream(
      sdf, "doc_id", "ver", "deleted", "dig")
    val query = out.writeStream.format("memory").queryName("upsert_view")
      .outputMode("append").start()
    try {
      // b1: two inserts
      mem.addData((1L, 1L, false, 11L), (2L, 1L, false, 21L))
      query.processAllAvailable()
      val b1 = spark.table("upsert_view").count()
      // b2: doc 1 jumps to v3, doc 3 appears, doc 2 tombstoned at v2
      mem.addData((1L, 3L, false, 13L), (3L, 1L, false, 31L),
        (2L, 2L, true, 0L))
      query.processAllAvailable()
      val b2 = spark.table("upsert_view").count()
      // b3: LATE v2 for doc 1 (stale) + replay of doc 2's tombstone —
      // both must be swallowed with no emission
      mem.addData((1L, 2L, false, 12L), (2L, 2L, true, 0L))
      query.processAllAvailable()
      val b3 = spark.table("upsert_view").count()
      assert(b1 == 2 && b2 == 5 && b3 == 5,
        s"emission counts ($b1, $b2, $b3)")
    } finally query.stop()
    // the latest emission per id IS the current view
    val view = spark.table("upsert_view")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3)))
      .groupBy(_._1).map { case (id, rows) => id -> rows.maxBy(_._2) }
    assert(view(1L) == ((1L, 3L, false, 13L)))
    assert(view(2L) == ((2L, 2L, true, 0L)))
    assert(view(3L) == ((3L, 1L, false, 31L)))
  }

  test("streaming LM scores against the stored model match the batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val train = Seq((0L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_stream").toString
    graft.pipeline.TextOps.writeLmModel(train, "text", "doc_id", dir)

    val mem = MemoryStream[(Long, String, Timestamp)]
    val sdf = mem.toDF.toDF("doc_id", "text", "event_time")
    val out = PipelineStreams.lmScoreStream(spark, dir, sdf,
      "text", "doc_id", "event_time", "5 seconds")
    val query = out.writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    try {
      mem.addData((10L, "a b c", ts(10)), (11L, "d e", ts(10)),
        (12L, "solo", ts(11)))
      query.processAllAvailable()
      // push the watermark past the first windows so they emit
      mem.addData((13L, "a b a b", ts(30)))
      query.processAllAvailable()
      mem.addData((14L, "b c", ts(60)))
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("lm_stream")
      .select("doc_id", "n_bigrams", "score_sum", "avg_score").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the three first-window docs plus 13 must have emitted (14's window
    // may still be open); values match the batch stored-model scorer
    val arrived = Seq((10L, "a b c"), (11L, "d e"), (12L, "solo"),
      (13L, "a b a b")).toDF("doc_id", "text")
    val batch = graft.pipeline.TextOps.scoreAgainstStoredLm(spark, dir,
        arrived, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(Set(10L, 11L, 12L, 13L).subsetOf(streamed.keySet))
    Seq(10L, 11L, 12L, 13L).foreach { id =>
      assert(streamed(id) == batch(id), s"doc $id: ${streamed.get(id)} vs ${batch.get(id)}")
    }
    // no-bigram doc emitted a zero row (outer explode), not silence
    assert(streamed(12L) == ((0L, 0L, 0L)))
  }
}
