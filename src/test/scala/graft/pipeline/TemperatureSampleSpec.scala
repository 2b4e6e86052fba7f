package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of √-temperature source rebalancing: exact agreement with
  * a JVM brute-force of the integer admission predicate, the
  * smallest-source-kept-in-full invariant, and the tempered-rate
  * ordering. */
class TemperatureSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val PPM = 1000000L

  /** JVM twin of HashFns.hash32(id.cast(string)) % PPM. */
  private def ppm(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % PPM
  }

  // sources a/b/c with 5/50/500 docs over disjoint id ranges
  private val docs: Seq[(Long, String)] =
    (1L to 5L).map(_ -> "a") ++ (100L to 149L).map(_ -> "b") ++
      (1000L to 1499L).map(_ -> "c")

  private def admitted(rows: Seq[(Long, String)]): Set[Long] = {
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = counts.values.min
    rows.filter { case (id, src) =>
      val h = BigInt(ppm(id))
      h * h * counts(src) < BigInt(PPM) * PPM * nMin
    }.map(_._1).toSet
  }

  test("admitted set matches the JVM brute-force predicate exactly") {
    val got = SamplingOps.temperatureSample(
        docs.toDF("doc_id", "source"), "doc_id", "source")
      .select("doc_id").as[Long].collect().toSet
    val expected = admitted(docs)
    assert(got == expected)
    // non-vacuous: the big source must actually be tempered
    val keptC = expected.count(_ >= 1000L)
    assert(keptC > 0 && keptC < 500)
  }

  test("smallest source is kept in full; kept counts scale as sqrt(n_s)") {
    val got = SamplingOps.temperatureSample(
        docs.toDF("doc_id", "source"), "doc_id", "source")
      .select("doc_id").as[Long].collect().toSet
    // rate 1 for the min source is deterministic: h² < PPM² always
    assert((1L to 5L).toSet.subsetOf(got))
    // admitted FRACTION falls as source size grows (√(n_min/n_s))
    val fracB = got.count(id => id >= 100L && id < 150L) / 50.0
    val fracC = got.count(_ >= 1000L) / 500.0
    assert(fracB > fracC,
      s"rates not tempered: b=$fracB c=$fracC")
  }

  test("single source degenerates to keep-everything") {
    val one = (1L to 40L).map(_ -> "only")
    val got = SamplingOps.temperatureSample(
        one.toDF("doc_id", "source"), "doc_id", "source")
      .count()
    assert(got == 40L)
  }
}
