package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the BPE tokenizer-training primitives: single-round
  * pair statistics against hand counts, and the multi-round merge
  * trainer against an independent plain-Scala implementation of the
  * same greedy semantics (left-to-right non-overlapping replacement,
  * ties by count DESC then pair lexicographic). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- independent JVM reference ----------------------------------------

  private def mergeList(syms: List[String], l: String,
                        r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (l + r) :: mergeList(rest, l, r)
    case a :: rest => a :: mergeList(rest, l, r)
    case Nil => Nil
  }

  private def jvmBpe(words: Map[String, Long],
                     nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words.filter(_._1.length >= 2)
      .map { case (w, f) => (w.map(_.toString).toList, f) }.toList
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for {
        (syms, f) <- vocab
        pair <- syms.sliding(2) if pair.length == 2
      } counts((pair.head, pair(1))) =
        counts.getOrElse((pair.head, pair(1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((rank, l, r, n))
        vocab = vocab.map { case (syms, f) => (mergeList(syms, l, r), f) }
      }
    }
    out.toSeq
  }

  // the classic BPE teaching corpus
  private val corpus: Map[String, Long] =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def corpusDf = {
    // one single-word doc per occurrence, plus a multi-word doc to
    // exercise tokenization (its words are counted too)
    val words = corpus.toSeq.flatMap { case (w, f) =>
      Seq.fill((f - 1).toInt)(w)
    } :+ corpus.keys.toSeq.sorted.mkString(" ")
    words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("pair counts match hand arithmetic on a two-word corpus") {
    val df = Seq((1L, "abab cd"), (2L, "abab")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(df, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // "abab" freq 2: pairs ab, ba, ab -> ab:4, ba:2; "cd" freq 1: cd:1
    assert(got == Map(("a", "b") -> 4L, ("b", "a") -> 2L, ("c", "d") -> 1L))
  }

  test("trainer matches the independent JVM implementation for 8 merges") {
    val got = TextOps.bpeTrain(corpusDf, "text", nMerges = 8)
    val expected = jvmBpe(corpus, nMerges = 8)
    assert(got == expected)
    // and the classic first merges appear: (e,s) from newest+widest=9,
    // then (es,t) — the textbook result for this corpus
    assert(got.take(2).map(m => (m._2, m._3)) == Seq(("e", "s"), ("es", "t")))
  }

  test("encode with trained merges: counts match the JVM reference; " +
    "unseen words encode char-per-symbol") {
    val merges = TextOps.bpeTrain(corpusDf, "text", nMerges = 8)
    val probe = Seq(
      (1L, "newest lowest"),   // lowest: unseen word, merges still fire where pairs match
      (2L, "low low"),
      (3L, "zq")               // fully unseen, no merge fires
    ).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(probe, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // JVM reference: apply the same merge list to each word
    val ms = merges.map(m => (m._2, m._3))
    def enc(w: String): Long = {
      var syms = w.map(_.toString).toList
      ms.foreach { case (l, r) =>
        syms = syms match { case _ => jvmMerge(syms, l, r) }
      }
      syms.length.toLong
    }
    def expected(text: String): Long =
      text.split(" ").filter(_.nonEmpty).map(enc).sum
    assert(got == Map(
      1L -> expected("newest lowest"),
      2L -> expected("low low"),
      3L -> 2L)) // z+q: no trained merge touches it
    // with zero merges, the count is plain character count of the words
    val raw = TextOps.bpeEncode(probe, "text", "doc_id", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw(1L) == 12L && raw(2L) == 6L && raw(3L) == 2L)
  }

  private def jvmMerge(syms: List[String], l: String,
                       r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (l + r) :: jvmMerge(rest, l, r)
    case a :: rest => a :: jvmMerge(rest, l, r)
    case Nil => Nil
  }

  test("symbolization has no phantom end-of-word symbol (the split " +
    "trailing-empty regression)") {
    // every word ends in 'x', so a trailing "" symbol would make
    // (x, "") the runaway top pair (count 40 vs 10 for any real pair) —
    // exactly what a 2M-word soak elected as merge 1 before the fix
    val words = Seq("ax", "bx", "cx", "dx")
    val df = words.flatMap(w => Seq.fill(10)(w)).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextOps.bpeTrain(df, "text", nMerges = 2)
    val expected = jvmBpe(words.map(_ -> 10L).toMap, nMerges = 2)
    assert(got == expected)
    assert(got.forall(m => m._2.nonEmpty && m._3.nonEmpty),
      s"empty symbol in merge table: $got")
    assert(got.head == ((1, "a", "x", 10L))) // tiebreak, not (x, "")
  }

  test("greedy merge is left-to-right non-overlapping (aaaa -> aa aa)") {
    val df = Seq((1L, "aaaa"), (2L, "aaaa"), (3L, "aaa")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(df, "text", nMerges = 2)
    val expected = jvmBpe(Map("aaaa" -> 2L, "aaa" -> 1L), nMerges = 2)
    assert(got == expected)
    // round 1: (a,a) = 2*3 + 1*2 = 8; after merge: [aa,aa]x2, [aa,a]x1
    assert(got.head == ((1, "a", "a", 8L)))
    // round 2: (aa,aa) = 2, (aa,a) = 1 -> (aa,aa)
    assert(got(1) == ((2, "aa", "aa", 2L)))
  }

  // ---- end-of-word marker mode ------------------------------------------

  private def jvmBpeEow(words: Map[String, Long],
                        nMerges: Int): Seq[(Int, String, String, Long)] = {
    // Sennrich exactly: every word (length >= 1) symbolizes to its
    // chars plus the </w> marker
    var vocab = words
      .map { case (w, f) =>
        (w.map(_.toString).toList :+ TextOps.EowMarker, f) }.toList
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for {
        (syms, f) <- vocab
        pair <- syms.sliding(2) if pair.length == 2
      } counts((pair.head, pair(1))) =
        counts.getOrElse((pair.head, pair(1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((rank, l, r, n))
        vocab = vocab.map { case (syms, f) => (jvmMerge(syms, l, r), f) }
      }
    }
    out.toSeq
  }

  test("endOfWord mode matches the Sennrich-exact JVM reference, " +
    "including 1-char words") {
    // "a" alone would be dropped without the marker; with it, (a, </w>)
    // is a real pair and the marker merges into word-final tokens
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "a" -> 4L)
    val df = words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = TextOps.bpeTrain(df, "text", nMerges = 8, endOfWord = true)
    val expected = jvmBpeEow(words, nMerges = 8)
    assert(got == expected)
    // the marker participates: some merge's right side carries </w>
    assert(got.exists(m => m._3.endsWith(TextOps.EowMarker)))
    // and encode under the same flag matches a by-hand fold
    val probe = Seq((1L, "low a"), (2L, "zq")).toDF("doc_id", "text")
    val enc = TextOps.bpeEncode(probe, "text", "doc_id", got,
        endOfWord = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def encOne(w: String): Long = {
      var syms = w.map(_.toString).toList :+ TextOps.EowMarker
      got.sortBy(_._1).foreach { case (_, l, r, _) =>
        syms = jvmMerge(syms, l, r) }
      syms.length.toLong
    }
    assert(enc == Map(1L -> (encOne("low") + encOne("a")),
      2L -> encOne("zq")))
  }

  test("bpeEncode refuses non-integral id columns loudly; null text " +
    "encodes to zero tokens") {
    val bad = Seq(("d1", "some text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeEncode(bad, "text", "doc_id", Seq.empty)
    }
    assert(e.getMessage.contains("integral id column"))
    assert(e.getMessage.contains("string"))
    val withNull = Seq((1L, "ab cd"), (2L, null))
      .toDF("doc_id", "text")
    val got = TextOps.bpeEncode(withNull, "text", "doc_id", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 0L))
  }

  // ---- the stored tokenizer model (fifteenth lifecycle) ------------------

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bpe_$tag")
      .toString + "/m"

  test("stored tokenizer: write→read round-trips the merge table; " +
    "encoding off the store equals the in-memory encode; endOfWord " +
    "is part of the model") {
    val corpus = Seq((1L, "query table query"), (2L, "table scan"))
      .toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(corpus, "text", nMerges = 6,
      endOfWord = true)
    val dir = tmp("serve")
    TextOps.writeBpeModel(spark, merges, dir, endOfWord = true)
    assert(TextOps.readBpeModel(spark, dir) === merges)
    val stored = TextOps.bpeEncodeStored(spark, dir, corpus, "text",
      "doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inMem = TextOps.bpeEncode(corpus, "text", "doc_id", merges,
      endOfWord = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored === inMem)
  }

  test("stored tokenizer: shape validation refuses gapped ranks and " +
    "empty symbols at write; a truncated stored relation fails the " +
    "read against the meta pin") {
    val dir = tmp("pin")
    intercept[IllegalArgumentException] {
      TextOps.writeBpeModel(spark,
        Seq((1, "a", "b", 3L), (3, "ab", "c", 2L)), dir)
    }
    intercept[IllegalArgumentException] {
      TextOps.writeBpeModel(spark, Seq((1, "", "b", 3L)), dir)
    }
    TextOps.writeBpeModel(spark,
      Seq((1, "a", "b", 3L), (2, "ab", "c", 2L)), dir)
    // truncate the stored relation under the meta's nose
    val meta = TextOps.readBpeModelMeta(spark, dir)
    import org.apache.spark.sql.functions.col
    val cut = spark.read.parquet(s"$dir/merges/e${meta.epoch}")
      .filter(col("rank") === 1).localCheckpoint()
    cut.write.mode("overwrite").parquet(s"$dir/merges/e${meta.epoch}")
    val e = intercept[IllegalArgumentException] {
      TextOps.readBpeModel(spark, dir)
    }
    assert(e.getMessage.contains("meta pins"))
  }

  test("stored tokenizer: retrain commits a NEW epoch behind the swap " +
    "with one superseded generation's grace; the served counts follow " +
    "the new model") {
    val dir = tmp("retrain")
    val c1 = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val c2 = Seq((1L, "zy zy zx zy")).toDF("doc_id", "text")
    TextOps.writeBpeModel(spark,
      TextOps.bpeTrain(c1, "text", 2), dir)
    val m0 = TextOps.readBpeModelMeta(spark, dir)
    TextOps.retrainBpeModel(spark, dir, c2, "text", nMerges = 2)
    val m1 = TextOps.readBpeModelMeta(spark, dir)
    assert(m1.epoch === m0.epoch + 1)
    assert(TextOps.readBpeModel(spark, dir) ===
      TextOps.bpeTrain(c2, "text", 2))
    // grace: the superseded epoch survives exactly one more retrain
    assert(new java.io.File(s"$dir/merges/e${m0.epoch}").exists)
    TextOps.retrainBpeModel(spark, dir, c1, "text", nMerges = 2)
    assert(!new java.io.File(s"$dir/merges/e${m0.epoch}").exists)
    assert(new java.io.File(s"$dir/merges/e${m1.epoch}").exists)
    val served = TextOps.bpeEncodeStored(spark, dir, c1, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = TextOps.bpeEncode(c1, "text", "doc_id",
      TextOps.bpeTrain(c1, "text", 2)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served === expect)
  }
}
