package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact dedup keeps min id per distinct content") {
    val df = Seq((5L, "aaa"), (2L, "aaa"), (3L, "bbb"), (9L, "bbb"), (1L, "ccc"))
      .toDF("doc_id", "text")
    val groups = DedupOps.exactDupGroups(df, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(groups.map(g => (g._2, g._3)) == Set((2L, 2L), (3L, 2L), (1L, 1L)))
    val kept = DedupOps.dedupExact(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 1L))
  }

  test("shingles produce k-grams; short texts produce none") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val sh = df.select(col("id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("identical docs share every minhash band; disjoint docs share none") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(df, "text", "doc_id",
        shingleK = 3, numHashes = 12, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard: identical=1, disjoint=0, known overlap") {
    val docs = Seq(
      (1L, "a b c d e"), // shingles: abc bcd cde
      (2L, "a b c d e"),
      (3L, "x y z w v"),
      (4L, "b c d e f")) // shingles: bcd cde def -> inter {bcd,cde}=2, union 4
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val j = DedupOps.ngramJaccard(docs, pairs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
    assert(j((1L, 4L)) == 0.5)
  }

  test("simhash: identical docs equal, different docs differ") {
    val df = Seq((1L, "spark scala data"), (2L, "spark scala data"),
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val s = DedupOps.simhash48(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(3L))
    assert(s.values.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("language id picks the matching profile") {
    val df = Seq(
      (1L, "der hund und die katze ist das"),
      (2L, "the cat is a friend of the dog"),
      (3L, "le chat et la vache est les"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.languageId(col("text")).getField("lang").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "de", 2L -> "en", 3L -> "fr"))
  }

  test("brute-force cosine top-k finds the aligned vector first") {
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),   // nearly aligned
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
      (4L, Array(0.5f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteForceTopK(q, corpus, "vec_id", "embedding", 3)
      .orderBy(desc("cosine"))
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L))
    assert(got(0)._2 > 0.99 && got(2)._2 == 0.0)
  }

  test("lsh buckets: identical vectors collide; lsh topk ranks by cosine") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(2.0f, 4.0f, 6.0f))) // colinear -> same projections signs
      .toDF("vec_id", "embedding")
    val b = vecs.select(SimilarityOps.lshBucket(col("embedding"), 8).as("b"))
      .as[Long].collect()
    assert(b.distinct.length == 1)
    val topk = SimilarityOps.lshCosineTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2, 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(topk.map(_._1).toSet == Set(1L, 2L))
    assert(topk.forall(_._2 > 0.999))
  }

  test("multimodal: byte stats match known ascii content") {
    val df = Seq((7L, "ab")).toDF("media_id", "content") // 'a'=97 'b'=98
    val out = MultimodalOps.byteStats(
      df.withColumn("content", col("content").cast("binary")), "content", "media_id")
      .collect().head
    assert(out.getLong(0) == 7L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 195L && out.getLong(3) == 97500L)
  }

  test("multi-probe lsh recall dominates single-probe vs brute-force truth") {
    val rnd = new scala.util.Random(3)
    val corpus = (0L until 250L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 25 === 0)
    def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val truth = neighborSets(SimilarityOps.bruteForceTopK(
      queries, corpus, "vec_id", "embedding", 5))
    val single = neighborSets(SimilarityOps.lshCosineTopK(
      queries, corpus, "vec_id", "embedding", 5, planes = 8))
    val multi = neighborSets(SimilarityOps.lshCosineTopKMultiProbe(
      queries, corpus, "vec_id", "embedding", 5, planes = 8))
    // per query: a true neighbor found by single-probe is also found by
    // multi-probe (candidate superset; a true top-5 member beaten by at
    // most 4 vectors globally survives any candidate-set top-5), so
    // recall is monotone per query, not just on average
    truth.keys.foreach { q =>
      val s = single.getOrElse(q, Set.empty) & truth(q)
      val m = multi.getOrElse(q, Set.empty) & truth(q)
      assert(s.subsetOf(m), s"query $q: single found ${s -- m} that multi missed")
    }
    val rs = truth.keys.toSeq.map(q => (single.getOrElse(q, Set.empty) & truth(q)).size).sum
    val rm = truth.keys.toSeq.map(q => (multi.getOrElse(q, Set.empty) & truth(q)).size).sum
    assert(rm >= rs)
  }

  test("sampling: hash-deterministic, rate-monotone, cap bounds groups") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val k200 = SamplingOps.sampleByHash(df, "id", 200)
      .select("id").as[Long].collect().toSet
    val k500 = SamplingOps.sampleByHash(df, "id", 500)
      .select("id").as[Long].collect().toSet
    // deterministic (same draw on rerun) and monotone in the rate
    assert(SamplingOps.sampleByHash(df, "id", 200)
      .select("id").as[Long].collect().toSet == k200)
    assert(k200.subsetOf(k500))
    assert(SamplingOps.sampleByHash(df, "id", 0).count() == 0)
    assert(SamplingOps.sampleByHash(df, "id", 1000).count() == 400)
    // mixture: rate 1000 keeps all of src0; unknown sources obey default
    val mixed = SamplingOps.mixtureSample(df, "id", "src",
      Map("src0" -> 1000, "src1" -> 0), defaultPermille = 1000)
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src0", 0L) == 100L && !bySrc.contains("src1"))
    assert(bySrc("src2") == 100L && bySrc("src3") == 100L)
    // cap: every group at most k, deterministic selection
    val capped = SamplingOps.capPerGroup(df, Seq("src"), "id", 7)
    assert(capped.groupBy("src").count().collect().forall(_.getLong(1) == 7L))
    assert(capped.select("id").as[Long].collect().toSet ==
      SamplingOps.capPerGroup(df, Seq("src"), "id", 7)
        .select("id").as[Long].collect().toSet)
  }

  test("token budget: greedy hash-ordered prefix per group, exclusive semantics") {
    // replicate hash32 (first 8 md5 hex chars as unsigned int) locally
    // and compute the expected greedy prefix independently
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val rows = (0L until 60L).map(i => (i, s"src${i % 3}", 10L + i % 7))
    val df = rows.toDF("id", "src", "tok")
    val budget = 50L
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (h32(r._1.toString), r._1))
      val cum = ordered.scanLeft(0L)(_ + _._3)
      ordered.zip(cum).collect { case (r, before) if before < budget => r._1 }
    }.toSet
    val got = SamplingOps.capTokensPerGroup(df, Seq("src"), "id", "tok", budget)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    // every non-empty group keeps at least one doc, even one over budget
    val big = Seq((1L, "a", 10000L), (2L, "a", 10000L)).toDF("id", "src", "tok")
    assert(SamplingOps.capTokensPerGroup(big, Seq("src"), "id", "tok", 50L)
      .count() == 1L)
  }

  test("token budget: negative counts fail loudly, null counts contribute zero") {
    // a negative count would shrink the running total and silently break
    // the overshoot-by-at-most-one contract — the guard must surface it
    val bad = Seq((1L, "a", 5L), (2L, "a", -1L)).toDF("id", "src", "tok")
    val e = intercept[Exception] {
      SamplingOps.capTokensPerGroup(bad, Seq("src"), "id", "tok", 50L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative tok")),
      s"expected the negative-count guard message, got: ${messages(e)}")
    // NULL counts: contribute 0 to the prefix; with every exclusive
    // prefix under budget (60 < 100 in any hash order) all docs survive
    val withNull = Seq((1L, "a", Option(30L)), (2L, "a", Option.empty[Long]),
      (3L, "a", Option(30L))).toDF("id", "src", "tok")
    assert(SamplingOps.capTokensPerGroup(withNull, Seq("src"), "id", "tok", 100L)
      .count() == 3L)
  }

  test("sequence packing: offsets, boundary spans, empty docs, per-shard") {
    // shard A: docs of 3, 4, 6 tokens with contextSize 5:
    //   doc1 @0 -> ctx 0 (tokens 0-2)
    //   doc2 @3 -> tokens 3-6: spans ctx 0 and 1
    //   doc3 @7 -> tokens 7-12: spans ctx 1 and 2
    // shard B packs independently from offset 0; doc20 is EMPTY at @2
    val df = Seq(
      ("A", 1L, 3L), ("A", 2L, 4L), ("A", 3L, 6L),
      ("B", 10L, 2L), ("B", 20L, 0L), ("B", 30L, 9L))
      .toDF("shard", "id", "n_tok")
    val out = PackingOps.packContexts(df, Seq("shard"), "id", "n_tok", 5L)
      .select("shard", "id", "pack_offset", "ctx_first", "ctx_last",
        "ctx_offset", "n_ctx_spanned")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("A", 1L, 0L, 0L, 0L, 0L, 1L),
      ("A", 2L, 3L, 0L, 1L, 3L, 2L),
      ("A", 3L, 7L, 1L, 2L, 2L, 2L),
      ("B", 10L, 0L, 0L, 0L, 0L, 1L),
      ("B", 20L, 2L, 0L, 0L, 2L, 1L),
      ("B", 30L, 2L, 0L, 2L, 2L, 3L)))
    // no token lost or duplicated: per shard, offsets are the exclusive
    // prefix sums of the token counts
    intercept[IllegalArgumentException] {
      PackingOps.packContexts(df, Seq.empty, "id", "n_tok", 5L)
    }
  }

  test("overlapping chunking: windows, stride overlap, short and empty docs") {
    // chunk=4, stride=3 (1-token overlap). 10 tokens -> chunks at 0,3,6
    // (chunks = 1 + ceil(6/3) = 3; last chunk is the full window 6..9);
    // 11 tokens -> extra partial chunk at 9 (2 tokens). Short docs yield
    // one chunk; empty text tokenizes to [""] (one empty token).
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val eleven = (1 to 11).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, ten), (2L, eleven), (3L, "a b"), (4L, ""))
      .toDF("doc_id", "text")
    val out = PackingOps.chunkDocuments(df, "text", "doc_id", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "t1 t2 t3 t4", 4L),
      (2L, 1L, "t4 t5 t6 t7", 4L),
      (2L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 3L, "t10 t11", 2L),
      (3L, 0L, "a b", 2L),
      (4L, 0L, "", 1L)))
    // overlap reconstructs the stream: consecutive chunks share
    // chunk-stride tokens; no token is lost
    intercept[IllegalArgumentException] {
      PackingOps.chunkDocuments(df, "text", "doc_id", 4, 5)
    }
  }

  test("multimodal: jpeg SOF walk recovers dims; rejects non-jpeg/truncated") {
    val good = Seq((1L, "body-bytes", 640L, 480L), (2L, "x", 17L, 65535L))
      .toDF("id", "body", "w", "h")
      .select(col("id"),
        MultimodalOps.jpegPayload(col("body"), col("w"), col("h")).as("content"))
    val parsed = MultimodalOps.withJpegMeta(good, "content")
      .select("id", "jpeg_width", "jpeg_height", "jpeg_channels")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(parsed.sortBy(_._1) == Seq((1L, 640L, 480L, 3L), (2L, 17L, 65535L, 3L)))

    // SOS before any SOF must STOP the walk (entropy data is not walked);
    // truncated/alien payloads must yield nulls, not garbage
    val sosFirst = "FFD8" + "FFDA0002" + "FFC0001108001000100301220002110103110100"
    val bad = Seq(
      (1L, sosFirst),                    // SOS first: SOF behind it ignored
      (2L, "FFD8FFE000"),                // truncated mid-segment
      (3L, "89504E470D0A1A0A00000000"),  // PNG, not JPEG
      (4L, ""))                          // empty
      .toDF("id", "hexs")
      .select(col("id"), unhex(col("hexs")).as("content"))
    val nulls = MultimodalOps.withJpegMeta(bad, "content")
      .select("id", "jpeg_width")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    assert(nulls.sortBy(_._1) == Seq((1L, true), (2L, true), (3L, true), (4L, true)))

    // SOF0 dimensions are 2-byte fields: an oversized value must fail
    // loudly, not truncate to its high nibbles
    val oversize = Seq((1L, "b", 70000L, 10L)).toDF("id", "body", "w", "h")
      .select(MultimodalOps.jpegPayload(col("body"), col("w"), col("h")).as("c"))
    val err = intercept[Exception] { oversize.collect() }
    assert(err.getMessage.contains("out of the 2-byte SOF0 range") ||
      Option(err.getCause).exists(_.getMessage.contains("out of the 2-byte SOF0 range")))
  }

  test("multimodal: frame thumbnails equal nearest-neighbor sums over " +
    "the formula pixels, and pass through when the frame already fits") {
    val ids = Seq(1L, 2L).toDF("doc_id")
    val packs = MultimodalOps.encodeSyntheticFramePack(ids, "doc_id")
    val maxDim = 8L
    val got = MultimodalOps
      .sampleFrameThumbs(packs, "content", "media_id", 2, maxDim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // independent recomputation straight from the generator formulas
    val want = (for {
      id <- Seq(1L, 2L)
      j <- 0 until MultimodalOps.synthFrameCount(id) if j % 2 == 0
    } yield {
      val fid = MultimodalOps.synthFrameImageId(id, j)
      val (w, h) = MultimodalOps.synthDims(fid)
      val m = math.max(w, h).toLong
      val (dw, dh) =
        if (m <= maxDim) (w, h)
        else (math.max(1L, w * maxDim / m).toInt,
          math.max(1L, h * maxDim / m).toInt)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until dh; x <- 0 until dw) {
        val sx = (x.toLong * w / dw).toInt; val sy = (y.toLong * h / dh).toInt
        val px = MultimodalOps.synthRgb(fid, sx, sy)
        sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
      }
      (id, j.toLong) -> (dw.toLong, dh.toLong, sr, sg, sb)
    }).toMap
    assert(got == want)
    // every sampled fid here has max(w,h) > 8, so every thumb really
    // resampled (no silent pass-through) and fits the cap
    assert(want.nonEmpty && want.values.forall { case (dw, dh, _, _, _) =>
      dw <= maxDim && dh <= maxDim && (dw < 8 || dh < 8 || dw == 8)
    })
    assert(want.values.exists { case (dw, dh, _, _, _) => dw < 8 || dh < 8 })
  }

  test("fingerprint is order-sensitive and stable") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "text")
    val fp = df.select(col("id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("ivf topk: probing finds the aligned neighbor (recall sanity)") {
    val vecs = (0L until 60L).map { i =>
      // three well-separated directions with noise-free members
      val base = (i % 3).toInt
      val v = Array.fill(4)(0.0f); v(base) = 1.0f; v(3) = 0.01f * (i / 3)
      (i, v)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0) // direction 0
    val got = SimilarityOps.ivfTopK(q, vecs, "vec_id", "embedding", 3,
      centroidStride = 5, nProbes = 2).collect()
    assert(got.nonEmpty && got.length <= 3)
    // every returned neighbor is direction-0 (cosine ~1), never orthogonal
    assert(got.forall(_.getDouble(2) > 0.9))
  }

  test("pq: codes stay in range, identical vectors share codes, adc ranks the aligned cluster first") {
    // 8-d vectors in two orthogonal directions; codebook from a stride
    // sample so every direction is represented
    val vecs = (0L until 64L).map { i =>
      val base = (i % 2).toInt * 4
      val v = Array.fill(8)(0.0f)
      v(base) = 1.0f; v(base + 1) = 0.02f * ((i / 2) % 4)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cbs = SimilarityOps.pqCodebooks(vecs, "vec_id", "embedding",
      numSubspaces = 2, numCodes = 8, stride = 7)
    assert(cbs.length == 2 && cbs.forall(_.length == 8))
    val enc = SimilarityOps.encodePq(vecs, "vec_id", "embedding", cbs).collect()
    assert(enc.length == 64)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 2 && codes.forall(c => c >= 0 && c < 8))
      assert(r.getLong(2) >= 0L)
    }
    // vec 0 and vec 2 differ only in the tiny second component of the
    // same direction — nearest codewords must coincide subspace-wise for
    // identical sub-vectors: vectors 0 and 16 share (i/2)%4 and parity
    val byId = enc.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(byId(0L) == byId(16L))
    // ADC top-k: for query 0 every hit is direction-0 (even ids)
    val q = vecs.filter(col("vec_id") === 0)
    val got = SimilarityOps.pqTopK(q, vecs, "vec_id", "embedding", 5, cbs).collect()
    assert(got.nonEmpty && got.forall(_.getLong(1) % 2 == 0))
    // deterministic: a second run returns the identical ranking
    val again = SimilarityOps.pqTopK(q, vecs, "vec_id", "embedding", 5, cbs).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("incremental dedup drops history hits then dedups within the batch") {
    val prior = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),  // in history -> dropped
      (11L, "brand new"),
      (12L, "brand new"),    // in-batch dup of 11 -> dropped
      (13L, "also new"))
      .toDF("doc_id", "text")
    val idx = DedupOps.digestIndex(prior, "text")
    val got = DedupOps.dedupAgainstIndex(batch, idx, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L))
  }

  test("profile: one aggregation pass yields per-column counts and natural-order ranges") {
    val df = Seq(
      (1L, Some("b"), 9L), (2L, None, 10L), (3L, Some("a"), 100L))
      .toDF("id", "s", "n")
    val got = ProfileOps.profile(df, Seq("id", "s", "n")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("id").getLong(1) == 3 && got("id").getLong(2) == 3 &&
      got("id").getLong(3) == 3)
    assert(got("s").getLong(2) == 2 && got("s").getLong(3) == 2 &&
      got("s").getString(4) == "a" && got("s").getString(5) == "b")
    // natural numeric order: min 9, max 100 (string order would say "10" < "9")
    assert(got("n").getString(4) == "9" && got("n").getString(5) == "100")
    intercept[IllegalArgumentException] {
      ProfileOps.profile(df, Seq("missing"))
    }
  }

  test("keep-best exact dedup keeps the highest-quality copy, ties to min id") {
    val df = Seq(
      (1L, "dup text", 10L), (2L, "dup text", 30L), (3L, "dup text", 30L),
      (4L, "unique", 5L))
      .toDF("doc_id", "text", "score")
    val got = DedupOps.dedupExactKeepBest(df, "text", "doc_id", col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 4L)) // 30 beats 10; id 2 beats id 3 at 30
  }

  test("deterministic k-means separates clusters and trains IVF") {
    // three tight clusters in 4-d
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val v = Array.fill(4)(0.05f * ((i / 3) % 3)); v(c) = 10.0f + (i % 2)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cents = SimilarityOps.kmeansCentroids(vecs, "vec_id", "embedding", k = 3, iters = 3)
    val got = cents.collect()
    assert(got.length == 3)
    // run twice -> bit-identical centroids (determinism)
    val again = SimilarityOps.kmeansCentroids(vecs, "vec_id", "embedding", k = 3, iters = 3)
      .collect()
    assert(got.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // trained IVF finds same-cluster neighbors
    val q = vecs.filter(col("vec_id") === 0)
    val topk = SimilarityOps.ivfTopKWithCentroids(q, vecs, "vec_id", "embedding",
      cents, k = 5, nProbes = 1).collect()
    assert(topk.nonEmpty)
    assert(topk.forall(r => r.getLong(1) % 3 == 0), // neighbors from cluster 0 only
      topk.map(_.getLong(1)).mkString(","))
  }
}
