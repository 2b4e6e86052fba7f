package graft.pipeline

import graft.SparkTestSession
import graft.pipeline.AdmissionOps.AdmissionStores
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed admission front door: first-failure verdicts against
  * the stored artifacts, precedence order, stage skipping, cascade
  * equivalence, the LM quality stage, and the report/admit views. The
  * individual screens each carry their own oracle; what THIS suite pins
  * is the composition — that chaining them through one verdict column
  * neither reorders, drops, nor double-counts any stage. */
class AdmissionOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_adm_$tag").toString

  // planted texts, one per verdict class (word lengths keep every
  // non-stopword text's quality above the 10.0 gate; the all-stopword
  // text scores 8 — below it)
  private val SharedText = "shared text"                    // in digest store
  private val StopText = "the the the the the the"          // fails quality gate
  private val NearText = "w1 w2 w3 w4 w5 w6"                // in minhash store
  private val BenchText = "c1 c2 c3 c4 c5"                  // decontam bench
  private val MinQ = 10.0

  /** Build the three stores once per suite. The digest store also
    * carries StopText so a gate-failing doc can ALSO be a stored exact
    * dup — the precedence probe. */
  private lazy val stores: AdmissionStores = {
    val dg = tmp("dg") + "/dg"
    DedupOps.writeDigestIndex(
      Seq((1000L, SharedText), (1001L, StopText)).toDF("doc_id", "text"),
      "text", dg)
    val mh = tmp("mh") + "/mh"
    DedupOps.writeMinhashIndex(
      Seq((2000L, NearText)).toDF("doc_id", "text"), "text", "doc_id", mh)
    val dc = tmp("dc") + "/dc"
    TextOps.writeDecontamIndex(
      Seq((3000L, BenchText)).toDF("doc_id", "text"), "text", "doc_id",
      dc, shingleK = 3)
    AdmissionStores(digestIndexPath = Some(dg), minhashIndexPath = Some(mh),
      decontamIndexPath = Some(dc))
  }

  private val batch = Seq(
    (1L, SharedText),                 // stored exact dup
    (3L, SharedText),                 // same digest group — also stored dup
    (5L, NearText),                   // near-dup of the minhash store
    (7L, "c1 c2 c3 c4 c5 z9 y8 x7"),  // >= 2 bench shingles -> contaminated
    (9L, "u1 u2 u3"),                 // novel -> admitted
    (11L, "u1 u2 u3"),                // in-batch dup of 9
    (13L, StopText),                  // gate fails AND stored dup -> gate
    (15L, "v1 v2 v3")                 // novel -> admitted
  ).toDF("doc_id", "text")

  private def verdicts(b: org.apache.spark.sql.DataFrame = batch,
                       s: AdmissionStores = stores,
                       minQuality: Option[Double] = Some(MinQ),
                       lmMin: Option[Long] = None,
                       nbMin: Option[Long] = None): Map[Long, String] =
    AdmissionOps.admissionVerdicts(spark, b, "text", "doc_id", s,
        langCode = None, minQuality = minQuality,
        nearDupMinAgree = 0.5, decontamMinOverlap = 2L,
        lmMinAvgScore = lmMin, nbMinMarginMicro = nbMin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("first-failure verdicts: every class lands on its planted doc, " +
    "and precedence beats later stages (gate over exact_dup; exact " +
    "over near/contam)") {
    val got = verdicts()
    assert(got == Map(
      1L -> "exact_dup", 3L -> "exact_dup", 5L -> "near_dup",
      7L -> "contaminated", 9L -> "admitted", 11L -> "exact_dup",
      13L -> "gate", 15L -> "admitted"), s"got $got")
  }

  test("stage skipping: a None store never yields its verdict; no gates " +
    "and no stores admits everything except in-batch dups") {
    val none = AdmissionStores()
    val got = verdicts(s = none, minQuality = None)
    assert(got.values.toSet == Set("admitted", "exact_dup"))
    assert(got(11L) == "exact_dup" && got(9L) == "admitted",
      "in-batch keep-min-id works with every store disabled")
    // only the digest store on: near/contam texts admit
    val dgOnly = AdmissionStores(digestIndexPath = stores.digestIndexPath)
    val got2 = verdicts(s = dgOnly, minQuality = None)
    assert(got2(5L) == "admitted" && got2(7L) == "admitted" &&
      got2(1L) == "exact_dup" && got2(13L) == "exact_dup")
  }

  test("cascade equivalence: the admitted set equals running the stages " +
    "one by one on survivors") {
    val admitted = AdmissionOps.admitAgainstStores(spark, batch, "text",
        "doc_id", stores, langCode = None, minQuality = Some(MinQ),
        nearDupMinAgree = 0.5, decontamMinOverlap = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the manual cascade, from the audited primitives
    val quals = TextOps.qualityColumns(col("text")).toMap
    val g = batch.filter(coalesce(quals("quality_score") >= MinQ, lit(false)))
    val s2 = DedupOps.dedupExactAgainstStoredIndex(spark,
      stores.digestIndexPath.get, g, "text", "doc_id")
    val s3 = s2.join(
      DedupOps.nearDupAgainstStoredIndex(spark, stores.minhashIndexPath.get,
          s2, "text", "doc_id", 0.5)
        .select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val s4 = s3.join(
      TextOps.screenAgainstStoredDecontam(spark, stores.decontamIndexPath.get,
          s3, "text", "doc_id", 2L)
        .select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val cascade = s4.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == cascade, s"one-plan $admitted != cascade $cascade")
    assert(admitted == Set(9L, 15L))
  }

  test("LM stage: docs scoring below lmMinAvgScore against the stored " +
    "model reject as low_quality, after every other stage") {
    val lm = tmp("lm") + "/lm"
    TextOps.writeLmModel(
      Seq((5000L, "a b a b a b a b"), (5001L, "a b a b")).toDF("doc_id", "text"),
      "text", "doc_id", lm)
    val s = stores.copy(lmModelPath = Some(lm))
    // in-model bigrams score high; unseen bigrams low; zero-bigram docs 0
    val probe = Seq((9L, "a b a b"), (15L, "q9"), (21L, "zz yy xx"))
      .toDF("doc_id", "text")
    val scored = TextOps.scoreAgainstStoredLm(spark, lm, probe, "text",
        "doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // threshold between the in-model doc and the rest
    val cut = scored(9L)
    assert(scored(15L) < cut && scored(21L) < cut,
      s"planted scores must separate, got $scored")
    val got = verdicts(b = probe, s = s, lmMin = Some(cut))
    assert(got == Map(9L -> "admitted", 15L -> "low_quality",
      21L -> "low_quality"), s"got $got")
    // and the knob without a model path refuses loudly
    intercept[IllegalArgumentException] {
      AdmissionOps.admissionVerdicts(spark, probe, "text", "doc_id",
        stores, lmMinAvgScore = Some(0L))
    }
  }

  test("classifier stage: docs whose stored-NB margin falls below " +
    "nbMinMarginMicro reject as classifier_reject — LAST before " +
    "admitted, so an LM-rejected doc keeps low_quality") {
    val nb = tmp("nb") + "/nb"
    // positive class speaks g-words, negative class z-words
    graft.pipeline.ClassifierOps.writeNbModel(
      Seq((1L, "g1 g2 g3 g1 g2", true), (2L, "g2 g3 g1 g3", true),
        (3L, "z1 z2 z3 z1 z2", false), (4L, "z2 z3 z1 z3", false))
        .toDF("doc_id", "text", "lab"),
      "text", "doc_id", "lab", nb, dim = 64)
    val sNb = stores.copy(nbModelPath = Some(nb))
    val probe = Seq((9L, "g1 g2 g3"), (15L, "z1 z2 z3"))
      .toDF("doc_id", "text")
    val got = verdicts(b = probe, s = sNb, nbMin = Some(0L))
    assert(got == Map(9L -> "admitted", 15L -> "classifier_reject"),
      s"got $got")
    // precedence: the LM stage still fires FIRST on a doc both would
    // reject
    val lm = tmp("nblm") + "/lm"
    TextOps.writeLmModel(
      Seq((5000L, "a b a b a b a b")).toDF("doc_id", "text"),
      "text", "doc_id", lm)
    val both = verdicts(b = probe, s = sNb.copy(lmModelPath = Some(lm)),
      lmMin = Some(Long.MaxValue), nbMin = Some(0L))
    assert(both == Map(9L -> "low_quality", 15L -> "low_quality"),
      s"LM must outrank the classifier, got $both")
    // and the knob without a model path refuses loudly
    intercept[IllegalArgumentException] {
      AdmissionOps.admissionVerdicts(spark, probe, "text", "doc_id",
        stores, nbMinMarginMicro = Some(0L))
    }
  }

  test("signatureStoreLag: in-sync loop stores report 0; a skipped " +
    "batch shows as a lag > 1") {
    val root = tmp("lag")
    val out = s"$root/out"; val dg = s"$root/dg"; val mh = s"$root/mh"
    val b0 = Seq((1L, "lag text one")).toDF("doc_id", "text")
    assert(AdmissionOps.ingestAdmissionBatch(spark, b0, "text", "doc_id",
      0L, out, dg, minhashIndexPath = Some(mh)))
    assert(AdmissionOps.signatureStoreLag(spark, dg, mh) == 0L)
    // simulate the skipped-catch-up gap: advance only the digest store
    val b5 = Seq((5L, "lag text five")).toDF("doc_id", "text")
    DedupOps.ingestDigestBatch(spark, dg, b5, "text", 5L,
      1 << 20, 4)
    assert(AdmissionOps.signatureStoreLag(spark, dg, mh) == 5L,
      "the skipped batches must be visible as pointer lag")
  }

  test("admit->ingest loop: each batch's admitted digests screen the " +
    "next batch; replays skip with the landed output untouched; a torn " +
    "landing dir is overwritten wholesale; id regressions refuse") {
    val out = tmp("loop_out")
    val dg = tmp("loop_dg") + "/dg"
    def ingest(rows: Seq[(Long, String)], id: Long): Boolean =
      AdmissionOps.ingestAdmissionBatch(spark, rows.toDF("doc_id", "text"),
        "text", "doc_id", id, out, dg, langCode = None, minQuality = None)
    def landed(id: Long): Set[Long] =
      spark.read.parquet(s"$out/b$id").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    // batch 0 builds the store: in-batch dup collapses, both novel
    // texts admit
    assert(ingest(Seq((1L, "one"), (3L, "two"), (5L, "one")), 0L))
    assert(landed(0L) == Set(1L, 3L))
    // batch 1: a byte-identical copy of an ADMITTED doc rejects as
    // exact_dup without any static store configured — the loop itself
    // provides the history
    assert(ingest(Seq((7L, "one"), (9L, "three")), 1L))
    assert(landed(1L) == Set(9L))
    // replay of batch 1: pointer skip, nothing rewritten — a
    // verdict-first replay would re-screen 9 against its own digest
    // and land an empty dir (the self-duplicate false positive)
    assert(!ingest(Seq((7L, "one"), (9L, "three")), 1L))
    assert(landed(1L) == Set(9L))
    // crash window: batch 2's landing dir half-written, ingest never
    // ran (pointer still 1) — the replay recomputes against the
    // unchanged store and overwrites the torn dir wholesale
    Seq((0L, "garbage")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/b2")
    assert(ingest(Seq((11L, "three"), (13L, "four")), 2L))
    assert(landed(2L) == Set(13L),
      "11 duplicates batch 1's admitted doc 9 and must reject")
    // id regressions refuse loudly, naming the backfill
    val err = intercept[IllegalArgumentException] {
      ingest(Seq((15L, "five")), 0L)
    }
    assert(err.getMessage.contains("regressed"))
    // and the store's coverage is exactly the admitted corpus
    assert(DedupOps.readDigestIndexMeta(spark, dg).digestCount == 4L,
      "digests: one, two, three, four")
  }

  test("admit->ingest loop with minhashIndexPath: batch N+1's near-dup " +
    "stage catches a PARAPHRASE of batch N's admission; both stores are " +
    "exactly-once across a replay; the between-ingests crash window " +
    "re-offers the landed rows to the signature store") {
    val out = tmp("nloop_out")
    val dg = tmp("nloop_dg") + "/dg"
    val mh = tmp("nloop_mh") + "/mh"
    // 30-token base → 28 shingles at k=3; the paraphrase swaps the last
    // token, sharing 26 of them (Jaccard ≈ 0.87) — byte-distinct, so
    // the exact screen passes it and only the near-dup screen can
    // catch it. Texts are fixed and the hashes deterministic, so the
    // assertion is exact, not probabilistic.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val para = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val para2 = ((1 to 29).map(i => s"tok$i") :+ "other").mkString(" ")
    def ingest(rows: Seq[(Long, String)], id: Long,
               withMh: Boolean = true): Boolean =
      AdmissionOps.ingestAdmissionBatch(spark, rows.toDF("doc_id", "text"),
        "text", "doc_id", id, out, dg, langCode = None, minQuality = None,
        minhashIndexPath = if (withMh) Some(mh) else None)
    def landed(id: Long): Set[Long] =
      spark.read.parquet(s"$out/b$id").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    def mhMeta = DedupOps.readMinhashIndexMeta(spark, mh)
    // batch 0 builds BOTH stores from its admissions
    assert(ingest(Seq((1L, base), (3L, "x1 x2 x3 x4")), 0L))
    assert(landed(0L) == Set(1L, 3L))
    assert(mhMeta.sigCount == 2L && mhMeta.lastBatchId == 0L)
    // batch 1: the paraphrase is a near_dup of batch 0's admission —
    // caught by the loop's own signature store, no static store set
    val loopStores = AdmissionStores(digestIndexPath = Some(dg),
      minhashIndexPath = Some(mh))
    val v = AdmissionOps.admissionVerdicts(spark,
        Seq((5L, para)).toDF("doc_id", "text"), "text", "doc_id",
        loopStores, langCode = None, minQuality = None)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(5L -> "near_dup"),
      s"paraphrase must flag near_dup against the loop's store, got $v")
    assert(ingest(Seq((5L, para), (7L, "y1 y2 y3 y4")), 1L))
    assert(landed(1L) == Set(7L))
    // replay of batch 1: both pointers skip; neither store grows
    val sigsBefore = mhMeta.sigCount
    assert(!ingest(Seq((5L, para), (7L, "y1 y2 y3 y4")), 1L))
    assert(mhMeta.sigCount == sigsBefore && mhMeta.lastBatchId == 1L,
      "replay must not re-fold signatures")
    assert(DedupOps.readDigestIndexMeta(spark, dg).lastBatchId == 1L)
    // the between-ingests crash window, simulated exactly: batch 2
    // commits the digest ingest but never reaches the signature fold
    // (run without minhashIndexPath)...
    assert(ingest(Seq((9L, para2 + " and more"), (11L, "z1 z2 z3")), 2L,
      withMh = false))
    assert(mhMeta.lastBatchId == 1L, "signature store must be behind")
    // ...the replay hits the digest pointer skip and re-offers the
    // LANDED rows to the signature store, catching it up exactly once
    assert(!ingest(Seq((9L, para2 + " and more"), (11L, "z1 z2 z3")), 2L))
    assert(mhMeta.lastBatchId == 2L && mhMeta.sigCount == sigsBefore + 2,
      "re-offer must fold exactly the landed batch-2 admissions")
    // a second replay is a pure no-op on both stores
    assert(!ingest(Seq((9L, para2 + " and more"), (11L, "z1 z2 z3")), 2L))
    assert(mhMeta.lastBatchId == 2L && mhMeta.sigCount == sigsBefore + 2)
    // a static minhash store alongside the loop-owned one refuses
    val err = intercept[IllegalArgumentException] {
      AdmissionOps.ingestAdmissionBatch(spark,
        Seq((13L, "w")).toDF("doc_id", "text"), "text", "doc_id", 3L,
        out, dg, staticStores = AdmissionStores(
          minhashIndexPath = Some(mh)),
        minhashIndexPath = Some(mh))
    }
    assert(err.getMessage.contains("OWNS the near-dup store"))
  }

  test("admitAgainstStores keeps the original schema; admissionReport " +
    "counts match the verdicts; helper-column collisions refuse") {
    val admitted = AdmissionOps.admitAgainstStores(spark, batch, "text",
      "doc_id", stores, langCode = None, minQuality = Some(MinQ),
      decontamMinOverlap = 2L)
    assert(admitted.columns.toSeq == Seq("doc_id", "text"))
    val report = AdmissionOps.admissionReport(spark, batch, "text",
        "doc_id", stores, langCode = None, minQuality = Some(MinQ),
        decontamMinOverlap = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byVerdict = verdicts().groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(report == byVerdict, s"report $report != verdicts $byVerdict")
    intercept[IllegalArgumentException] {
      AdmissionOps.admissionVerdicts(spark,
        batch.withColumn("__ad_gate", lit(false)), "text", "doc_id", stores)
    }
  }
}
