package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the round-6 one-pass kernels against the
  * relational forms they replaced — the forms the DuckDB oracles still
  * unroll. The oracle gate proves equivalence on the driver corpus;
  * these properties prove it on adversarial token shapes (empty text,
  * consecutive spaces, single tokens, long docs) the corpus may not
  * contain. One Spark job per family, hundreds of generated docs. */
class KernelPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic adversarial corpus: empty, spaces-only, sub-k docs,
    * repeated tokens, long mixed docs — seeded arithmetic, no RNG. */
  private def corpus: Seq[(Long, String)] = {
    val words = (0 until 60).map(i => s"w${(i * 7919) % 97}")
    val crafted = Seq("", " ", "  ", "one", "one two", "a  b",
      " leading", "trailing ", "x " * 40 + "x")
    val generated = (0 until 120).map { i =>
      val n = 1 + (i * 13) % 30
      (0 until n).map(j => words((i * 31 + j * 17) % words.size))
        .mkString(" ")
    }
    (crafted ++ generated).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("MinhashSig kernel ≡ relational explode/min/join-back form") {
    val df = corpus.toDF("doc_id", "text")
    val numHashes = 12
    // the pre-kernel relational form, inlined as the reference
    val tok = df.select(col("doc_id"),
      explode(graft.functions.TokenShingleHash.shingleHashes(col("text"), 3))
        .as("h"))
    val mins = (0 until numHashes).map { i =>
      min((col("h") * DedupOps.minhashA(i) + DedupOps.minhashB(i))
        % DedupOps.MinhashPrime).as(s"s$i")
    }
    val sentinel = array(Seq.fill(numHashes)(lit(DedupOps.MinhashPrime)): _*)
    val reference = df.join(
        tok.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
          .select(col("doc_id"),
            array((0 until numHashes).map(i => col(s"s$i")): _*).as("sig")),
        Seq("doc_id"), "left")
      .withColumn("sig", coalesce(col("sig"), sentinel))
      .select("doc_id", "sig")
    val kernel = DedupOps.withMinhashSignature(df, "text", "doc_id", "sig")
      .select("doc_id", "sig")
    assert(kernel.exceptAll(reference).isEmpty &&
      reference.exceptAll(kernel).isEmpty)
  }

  test("SimHash48 kernel ≡ relational explode/48-sum form") {
    val df = corpus.toDF("doc_id", "text")
    val tok = df.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("t"))
      .withColumn("h", HashFns.hash60(col("t")))
    val bitSums = (0 until 48).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"s$b")
    }
    val packed = (0 until 48).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val reference = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n_tok")): _*)
      .select(col("doc_id"), packed.as("simhash"), col("n_tok"))
    val kernel = DedupOps.simhash48WithCount(df, "text", "doc_id")
    assert(kernel.exceptAll(reference).isEmpty &&
      reference.exceptAll(kernel).isEmpty)
  }

  test("PqEncode kernel ≡ relational struct-argmin form") {
    val vecs = (0L until 150L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 2001) - 1000).toFloat / 250f))
    }.toDF("vec_id", "embedding")
    val cbs: Seq[Seq[(Int, Seq[Long], Long)]] = (0 until 2).map { m =>
      (0 until 4).map { c =>
        val cw = (0 until 4).map(d => ((m * 811 + c * 241 + d * 97) % 1601 - 800).toLong)
        (c, cw, cw.map(x => x * x).sum)
      }
    }
    val sv = SimilarityOps.scaled(col("embedding"))
    // pre-kernel reference: array_min over (dist, code, cn2) structs
    val picks = (0 until 2).map { m =>
      val sub = slice(sv, m * 4 + 1, 4)
      val cands = cbs(m).map { case (c, cw, n2) =>
        val dist = aggregate(
          zip_with(sub, array(cw.map(lit): _*), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, d) => acc + d)
        struct(dist.as("dist"), lit(c).as("code"), lit(n2).as("cn2"))
      }
      array_min(array(cands: _*)).as(s"m$m")
    }
    val reference = vecs.select(col("vec_id") +: picks: _*)
      .select(col("vec_id"),
        array(col("m0").getField("code"), col("m1").getField("code")).as("codes"),
        (col("m0").getField("cn2") + col("m1").getField("cn2")).as("rec_n2"))
    val kernel = SimilarityOps.encodePq(vecs, "vec_id", "embedding", cbs)
      .withColumnRenamed("pq_id", "vec_id")
    assert(kernel.exceptAll(reference).isEmpty &&
      reference.exceptAll(kernel).isEmpty)
  }
}
