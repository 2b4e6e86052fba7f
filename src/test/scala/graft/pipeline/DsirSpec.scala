package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("target == whole corpus -> every scored doc weighs exactly 1.0 (1e6 ppm)") {
    // with c_t = c_all and N_t = N_r the ratio is identically scale
    val df = Seq((1L, "a b c"), (2L, "c d"), (3L, "e f g h"))
      .toDF("id", "text")
    val out = TextOps.dsirWeights(df, "text", "id", lit(true), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1000000L)))
    assert(out(2L) == ((1L, 1000000L)))
    assert(out(3L) == ((3L, 1000000L)))
  }

  test("target-like docs outweigh raw-only docs; no-bigram docs score 0") {
    val target = (0 until 10).map(i => (i.toLong, "x y z x y"))
    val other = (10 until 20).map(i => (i.toLong, "p q r p q"))
    val probes = Seq((100L, "x y"), (101L, "p q"), (102L, "solo"),
      (103L, null.asInstanceOf[String]))
    val df = (target ++ other ++ probes).toDF("id", "text")
    val out = TextOps.dsirWeights(df, "text", "id", col("id") < 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // with add-one smoothing over B >> N the absolute scale compresses
    // toward 1.0; the SELECTION signal is the ordering, and it is wide
    assert(out(100L) > out(101L),
      s"target-like must outrank raw-only: $out")
    assert(out(0L) > out(10L), "target member must outrank raw member")
    assert(out(101L) < 1000000L, "raw-only stays below 1.0")
    assert(out(102L) == 0L && out(103L) == 0L)
  }

  test("empty target slice is well-defined (uniform target model)") {
    // c_t = 0 everywhere and N_t = buckets: ratios are (N_r+B)/((c_r+1)*B)
    // -- no divide-by-zero, frequent raw features weigh least
    val df = Seq((1L, "a b a b a b a b"), (2L, "q r")).toDF("id", "text")
    val out = TextOps.dsirWeights(df, "text", "id", lit(false))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) > 0L && out(2L) > 0L)
    assert(out(1L) < out(2L), "the more frequent feature must weigh less")
  }
}
