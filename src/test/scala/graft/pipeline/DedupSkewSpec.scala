package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** De-skew contract for the LSH pair generators: near-empty docs (no
  * shingles) and zero embeddings (no direction) are excluded from
  * candidate generation, so a corpus dominated by them cannot form a
  * quadratic hot bucket. */
class DedupSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("empty/short docs never reach minhash banding; real dups still pair") {
    val empties = (0L until 100L).map(i => (i, ""))           // all-sentinel
    val shorts = (100L until 200L).map(i => (i, "two words")) // < k tokens
    val dups = (200L until 205L).map(i => (i, "the same real document body here"))
    val uniques = (300L until 305L).map(i =>
      (i, s"totally distinct content number $i with several words"))
    val df = (empties ++ shorts ++ dups ++ uniques).toDF("doc_id", "text")

    val pairs = DedupOps.minhashCandidatePairs(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // without the sentinel filter the 200 shingle-less docs would form
    // C(200,2) = 19900 pairs; with it, none of them appears at all
    assert(pairs.forall { case (a, b) => a >= 200 && b >= 200 },
      s"shingle-less doc leaked into candidates: ${pairs.take(5).toSeq}")
    // the 5 identical docs must still produce all C(5,2) = 10 pairs
    val dupPairs = pairs.filter { case (a, b) => a < 300 && b < 300 }
    assert(dupPairs.length == 10)
    // bounded overall: at most pairs among the 10 real docs
    assert(pairs.length <= 45)
  }

  test("hot-band cap drops boilerplate buckets; other bands still pair") {
    // 30 identical boilerplate docs concentrate every band bucket they
    // touch; 2 identical "real" docs sit under the cap. With the cap at
    // 10 the boilerplate's C(30,2) = 435 pairs vanish and only the real
    // pair survives; uncapped, all 436 appear.
    val boiler = (0L until 30L).map(i =>
      (i, "subscribe to our newsletter for daily updates and offers"))
    val real = Seq(
      (100L, "a genuinely unique article body with enough words to shingle"),
      (101L, "a genuinely unique article body with enough words to shingle"))
    val df = (boiler ++ real).toDF("doc_id", "text")

    val capped = DedupOps.minhashCandidatePairs(df, "text", "doc_id",
        maxBandFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"expected only the under-cap pair, got ${capped.take(5)}")

    val uncapped = DedupOps.minhashCandidatePairs(df, "text", "doc_id",
        maxBandFreq = Int.MaxValue)
      .collect().length
    assert(uncapped == 435 + 1)

    // the diagnostic surfaces exactly the truncated buckets (every band
    // of the 30-doc boilerplate bucket), each with its count
    val hot = DedupOps.hotBandStats(df, "text", "doc_id", maxBandFreq = 10)
      .collect().map(r => r.getLong(2))
    assert(hot.nonEmpty && hot.forall(_ == 30L))
  }

  test("index-side hot-band cap bounds the incremental screen") {
    // history holds 25 copies of a boilerplate doc: every band bucket
    // of it exceeds a cap of 10, so a new boilerplate doc is NOT
    // flagged against history (the cap trade); a normal near-dup of an
    // under-cap history doc still is.
    val history = ((0L until 25L).map(i =>
      (i, "subscribe to our newsletter for daily updates and offers")) :+
      (50L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "subscribe to our newsletter for daily updates and offers"),
      (101L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val idx = DedupOps.minhashSigIndex(history, "text", "doc_id")
    val flagged = DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id",
        maxBandFreq = 10)
      .select("new_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(101L))
    val unflagged = DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id",
        maxBandFreq = Int.MaxValue)
      .select("new_id").distinct().collect().map(_.getLong(0)).toSet
    assert(unflagged == Set(100L, 101L))
  }

  test("incremental screen bloom-prefilters the batch BELOW the band join") {
    val history = (0L until 40L).map(i =>
      (i, s"history document number $i with some shared words here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "history document number 7 with some shared words here"),
      (101L, "completely unrelated fresh content that matches nothing old"))
      .toDF("doc_id", "text")
    val idx = DedupOps.minhashSigIndex(history, "text", "doc_id")
    val screened = DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id")

    // the bloom probe must sit on the batch side BELOW the band
    // equi-join — a map-side prefilter, not a post-join residual. The
    // tree prints parents before children, so the probe's Filter line
    // must come AFTER the band join's line (string traversal like
    // PlanAuditSpec — plan.collect can't see through the AQE wrapper).
    val lines = screened.queryExecution.executedPlan.toString.linesIterator.toVector
    val joinAt = lines.indexWhere(l =>
      l.contains("Join") && l.contains("band_idx") && l.contains("band_hash"))
    val probeAt = lines.indexWhere(_.contains("bloom_might_contain"))
    assert(joinAt >= 0, s"no band join in:\n${lines.mkString("\n")}")
    assert(probeAt > joinAt,
      s"bloom probe not below the band join (join@$joinAt, probe@$probeAt):\n" +
        lines.mkString("\n"))

    // exact duplicate of history doc 7 flagged; fresh content not
    val flagged = screened.select("new_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(100L))
  }

  test("end-to-end near-dup dedup keeps min-id representatives") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1/2
      (4L, "completely different text about spark engines here"),
      (5L, ""),                                              // no shingles
      (6L, "two words"))                                     // < k tokens
      .toDF("doc_id", "text")
    val kept = DedupOps.dedupNearMinhash(docs, "text", "doc_id",
        shingleK = 3, numHashes = 12, bands = 4, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 2 dropped (exact dup of 1); 3 dropped iff its jaccard vs 1 >= 0.5:
    // shingles of 9-token docs differing in the last token share 6 of 7
    // shingles -> union 8, jaccard 6/8 = 0.75 -> dropped.
    // 5 and 6 have no shingles -> never candidates -> kept.
    assert(kept == Seq(1L, 4L, 5L, 6L))
  }

  test("connected components: min-label propagation over pair chains") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> component 1
      (10L, 11L),                    // isolated pair -> component 10
      (20L, 22L), (21L, 22L))        // star -> component 20
      .toDF("id_a", "id_b")
    val comps = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("transitive dedup collapses hubs the edge-local rule keeps") {
    // doc2 ~ doc5 and doc3 ~ doc5 are verified near-dups, but doc2 vs
    // doc3 is below the threshold. Edge-local drops only nodes with a
    // SMALLER verified neighbor: 5 is dropped (neighbors 2, 3), but 3's
    // only neighbor is the larger 5, so 3 survives. Transitive collapses
    // the whole component {2,3,5} to its min representative 2.
    val docA = "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10 t11 t12" // id 2
    val docB = "t01 t02 t03 t04 t05 t06 t07 t08 t09 x1 x2 x3"    // id 5, ~A, ~C
    val docC = "y1 y2 y3 t04 t05 t06 t07 t08 t09 x1 x2 x3"       // id 3, ~B only
    val docs = Seq((2L, docA), (5L, docB), (3L, docC),
      (50L, "completely unrelated content with many different words here"))
      .toDF("doc_id", "text")
    // bands = numHashes (1 row per band) maximizes candidate recall so
    // the test is about the VERIFY + component semantics, not LSH luck
    val keptT = DedupOps.dedupNearTransitive(docs, "text", "doc_id",
        shingleK = 3, numHashes = 12, bands = 12, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptT == Seq(2L, 50L), s"transitive kept $keptT")
    val keptE = DedupOps.dedupNearMinhash(docs, "text", "doc_id",
        shingleK = 3, numHashes = 12, bands = 12, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptE == Seq(2L, 3L, 50L), s"edge-local kept $keptE")
  }

  test("simhash pairs: minTokens de-skews tiny docs; Hamming filter is exact") {
    // 100 near-empty docs ("a b") all collapse to the same near-zero
    // signature — without the minTokens filter they'd form C(100,2)
    // pairs through one hot chunk bucket.
    val tiny = (0L until 100L).map(i => (i, "a b"))
    val base = "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9 tok10 " +
      "tok11 tok12 tok13 tok14 tok15 tok16 tok17 tok18 tok19 tok20"
    val nearDup = Seq((200L, base), (201L, base + " extra"), // tiny perturbation
      (202L, base))                                          // exact dup of 200
    val far = (300L until 305L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h"))
    val df = (tiny ++ nearDup ++ far).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(df, "text", "doc_id",
        maxHamming = 3, bands = 4, minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall { case (a, b, _) => a >= 200 && b >= 200 },
      s"tiny doc leaked into simhash candidates: ${pairs.take(5).toSeq}")
    // the exact dup pair must appear with Hamming 0
    assert(pairs.exists { case (a, b, h) => a == 200 && b == 202 && h == 0 })
    // every emitted pair respects the Hamming bound
    assert(pairs.forall(_._3 <= 3))
    // bounded overall: only pairs among the 8 real docs are possible
    assert(pairs.length <= 28)
  }

  test("simhash pairs: pigeonhole recall for Hamming <= bands-1") {
    // construct two signatures at known Hamming distance via texts is
    // hard; instead verify the pairing END-TO-END against a brute-force
    // Hamming computation over the same signatures.
    val rnd = new scala.util.Random(7)
    val docs = (0L until 60L).map { i =>
      val words = (0 until 12).map(_ => s"w${rnd.nextInt(30)}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = DedupOps.simhash48(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b)).toSet
    val got = DedupOps.simhashPairs(docs, "text", "doc_id",
        maxHamming = 3, bands = 4, minTokens = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("connected components: round cap fails loudly and leaks no blocks") {
    // a 6-node chain has diameter 5 — min-label propagation cannot
    // converge in 2 rounds, and silently-wrong components are worse
    // than an error
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // compare ID SETS, not counts: the shared session's ContextCleaner
    // may reclaim unrelated localCheckpoint blocks (corpus filter,
    // k-means) mid-test, shrinking a global count and faking a leak
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    val ex = intercept[IllegalStateException] {
      DedupOps.connectedComponents(chain, maxRounds = 2).count()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the failure path must unpersist edges AND the in-flight labels
    val residual = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
    assert(residual.isEmpty,
      s"failed connectedComponents left persisted blocks behind: $residual")
    // and a cap that is large enough converges fine
    val labels = DedupOps.connectedComponents(chain, maxRounds = 10)
    assert(labels.collect().map(_.getLong(1)).forall(_ == 1L))
    labels.unpersist()
  }

  test("repeated dedup calls do not accumulate persisted candidate blocks") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different text about spark engines here"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val calls = 3
    (1 to calls).foreach { _ =>
      DedupOps.dedupNearMinhash(docs, "text", "doc_id").count()
      DedupOps.dedupNearTransitive(docs, "text", "doc_id").count()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    // every explicit persist (candidate pairs, per-round labels, edges) is
    // unpersisted before return; the only residue is the one tiny
    // ContextCleaner-owned localCheckpoint of the drop set per call
    // (freed on GC). Pre-fix this leaked 2+ cached frames per call and
    // grew without bound.
    assert(after - before <= 2 * calls,
      s"cached blocks grew from $before to $after over ${2 * calls} calls")
  }

  test("star connected components: chain graphs converge in O(log n) rounds") {
    // a 300-link chain has diameter 300 — min-label propagation needs
    // 300 rounds (its default cap of 64 fails loudly), while the
    // alternating large-star/small-star fixpoint lands in ~log2(300)
    // rounds. This is the crawl-snapshot-chain shape that motivates it.
    val n = 300
    val chain = (0L until n.toLong - 1).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DedupOps.connectedComponents(chain, maxRounds = 64)
    }
    val labels = DedupOps.connectedComponentsStar(chain, maxRounds = 32)
    try {
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == n && got.values.forall(_ == 0L))
    } finally labels.unpersist()
  }

  test("star connected components agree with label propagation and leak no blocks") {
    val rnd = new scala.util.Random(97)
    // random sparse graph: several components of mixed shape
    val pairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(200).toLong
      val b = rnd.nextInt(200).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val star = DedupOps.connectedComponentsStar(pairs)
    val gotStar =
      try star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally star.unpersist()
    // star CC never localCheckpoints, so hygiene is exact: every persist
    // (nodes, per-round edges, result) is matched by an unpersist.
    // (The min-label variant below may leave one ContextCleaner-owned
    // localCheckpoint block per 8 rounds, freed on GC — measured
    // separately for that reason.)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 0,
      s"persisted blocks grew from $before to $after after unpersisting results")
    val prop = DedupOps.connectedComponents(pairs)
    val gotProp =
      try prop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally prop.unpersist()
    assert(gotStar == gotProp)
  }

  test("exact quantiles match a sorted-sequence reference") {
    val rnd = new scala.util.Random(23)
    val vals = (0 until 500).map(_ => rnd.nextInt(100).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val qs = Seq(100, 500, 900, 990, 1000)
    val got = StatsOps.exactQuantiles(df, col("v"), qs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = (q.toLong * vals.length + 999) / 1000
      assert(got(q.toLong) == sorted(rank.toInt - 1), s"q=$q")
    }
  }

  test("exact quantiles scale to a high-cardinality continuous metric") {
    // 20k DISTINCT doubles — the shape that funneled every value through
    // one task when the cumulative count ran as a single unpartitioned
    // Window.orderBy(v). The two-pass form (range partition + in-partition
    // cumsum + broadcast prefix offsets) must (a) stay correct and (b)
    // keep the window over the distinct-value relation PARTITIONED.
    val rnd = new scala.util.Random(41)
    val vals = (0 until 20000).map(_ => rnd.nextDouble() * 1e6)
    assert(vals.distinct.length == vals.length)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val qs = Seq(10, 250, 500, 750, 999)
    val out = StatsOps.exactQuantiles(df, col("v"), qs)
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = (q.toLong * vals.length + 999) / 1000
      assert(got(q.toLong) == sorted(rank.toInt - 1), s"q=$q")
    }
    // the cumulative window (producer of cum_in) must carry a partition
    // spec; the only unpartitioned window allowed is the prefix-offset
    // one over the per-partition totals (<= shuffle-partition-count rows).
    // AQE wraps the executed plan — descend through adaptive/stage nodes.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = (p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case w: WindowExec => Seq(w)
      case _ => Seq.empty
    }) ++ p.children.flatMap(windows)
    val cumWindows = windows(out.queryExecution.executedPlan)
      .filter(_.windowExpression.exists(_.toString.contains("cum_in")))
    assert(cumWindows.nonEmpty, "expected the in-partition cumsum window")
    assert(cumWindows.forall(_.partitionSpec.nonEmpty),
      "the distinct-value cumsum window must be partitioned")
  }

  test("exact quantiles: one NaN neither poisons bucketing nor shifts finite ranks wrongly") {
    // Spark's max() treats NaN as greatest, so an unfiltered min/max
    // snapshot would return mx = NaN and collapse every finite value
    // into one bucket. NaN rows themselves sort greatest (both engines),
    // so they only occupy the top ranks.
    val rnd = new scala.util.Random(7)
    val finite = (0 until 5000).map(_ => rnd.nextDouble() * 1000)
    val vals = finite :+ Double.NaN
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val qs = Seq(100, 500, 900)
    val got = StatsOps.exactQuantiles(df, col("v"), qs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = finite.sorted :+ Double.NaN // NaN sorts last
    qs.foreach { q =>
      val rank = (q.toLong * vals.length + 999) / 1000
      assert(got(q.toLong) == sorted(rank.toInt - 1), s"q=$q")
    }
  }

  test("exact quantiles: infinite values keep their rank without widening buckets") {
    // ±Infinity is excluded from the min/max snapshot (an infinite
    // endpoint would collapse width to Infinity and funnel every finite
    // value into bucket 0) and routed to the end buckets instead, where
    // the within-bucket ORDER BY keeps it in rank order
    val rnd = new scala.util.Random(13)
    val finite = (0 until 5000).map(_ => rnd.nextDouble() * 1000)
    val vals = Double.NegativeInfinity +: finite :+ Double.PositiveInfinity
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val qs = Seq(1, 100, 500, 900, 1000)
    val got = StatsOps.exactQuantiles(df, col("v"), qs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted // -Inf first, +Inf last
    qs.foreach { q =>
      val rank = (q.toLong * vals.length + 999) / 1000
      assert(got(q.toLong) == sorted(rank.toInt - 1), s"q=$q")
    }
  }

  test("exact quantiles on a non-numeric metric stay order-correct") {
    // lexicographic order disagrees with numeric-cast order ("9" > "10"),
    // so the distributed bucketing must not apply; the single-bucket
    // fallback keeps the natural ordering
    val df = Seq("10", "9", "90", "100", "apple", "Zed")
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = StatsOps.exactQuantiles(df, col("v"), Seq(500, 1000))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sorted = Seq("10", "9", "90", "100", "apple", "Zed").sorted
    assert(got(500L) == sorted((500 * 6 + 999) / 1000 - 1))
    assert(got(1000L) == sorted.last)
  }

  test("jaccard over LSH candidates plans without a nested-loop join") {
    // the q_ngram_jaccard registry row feeds ngramJaccard from
    // minhashCandidatePairs (banded equi-join); the whole composition
    // must stay equi-join-only — a BroadcastNestedLoopJoin here would be
    // the all-pairs shape LSH exists to avoid
    val docs = (0L until 60L).map { i =>
      (i, if (i % 2 == 0) "the quick brown fox jumps over the lazy dog"
          else s"unique text body number $i with trailing words here")
    }.toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(docs, "text", "doc_id")
    val out = DedupOps.ngramJaccard(docs, pairs, "text", "doc_id", 3)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the candidate-jaccard plan:\n$plan")
  }

  test("embedding transitive dedup collapses via a middle node edge-local keeps") {
    // star through the MIDDLE id: vectors at ids 1, 5, 3 point in nearly
    // the same direction; with threshold 0.999 the pairs are (1,5) and
    // (3,5) but NOT (1,3). Edge-local dedup would KEEP id 3 (its only
    // neighbor, 5, has a larger id); transitive CC labels the whole
    // component with root 1 and drops both 3 and 5. Vector 9 is
    // orthogonal — unpaired, always kept.
    val vecs = Seq(
      (1L, Array(100.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(100.0f, 3.0f, 0.0f, 0.0f)),
      (3L, Array(100.0f, 6.0f, 0.0f, 0.0f)),
      (9L, Array(0.0f, 0.0f, 50.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = SimilarityOps.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.999, planes = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 5L), (3L, 5L)), s"unexpected pair graph: $pairs")
    val kept = SimilarityOps.dedupEmbedTransitive(vecs, "vec_id", "embedding",
        threshold = 0.999, planes = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }

  test("zero vectors never reach cosine near-dup bucketing") {
    val zeros = (0L until 50L).map(i => (i, Array.fill(8)(0.0f)))
    val realA = Seq((100L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (101L, Array(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val df = (zeros ++ realA).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.cosineNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a >= 100 && b >= 100 })
    assert(pairs.toSeq == Seq((100L, 101L)))
  }
}
