package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LongArrayDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("matches the higher-order-function form on random arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(70)
      (i.toLong, Array.fill(len)(rnd.nextLong() % 100000), Array.fill(len)(rnd.nextLong() % 100000))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      LongArrayDot.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("slow"))
    assert(out.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("edge cases: empty arrays, unequal lengths, nulls") {
    val df = Seq(
      (1L, Some(Array.empty[Long]), Some(Array.empty[Long])),
      (2L, Some(Array(1L, 2L, 3L)), Some(Array(10L, 20L))), // length mismatch -> null
      (3L, None, Some(Array(1L))),
      (4L, Some(Array(5L)), None))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), LongArrayDot.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(0L))
    // unequal lengths: the HOF form (zip_with null-pads) yields NULL too
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("interpreted eval path matches codegen path") {
    val e = LongArrayDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 4L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(10L, 100L, 1000L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2L * 10 + 3L * 100 + 4L * 1000)
  }

  test("wrong input type is rejected at analysis") {
    val df = Seq((1L, "notarray")).toDF("id", "a")
    val err = intercept[Exception] {
      df.select(LongArrayDot.dot(col("a"), col("a"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("long_array_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch") ||
      err.getMessage.toLowerCase.contains("array<bigint>"))
  }

  test("null ELEMENT nulls the result, matching the HOF form") {
    val df = Seq((1L, Seq(Some(1L), None, Some(3L)), Seq(Some(2L), Some(2L), Some(2L))))
      .toDF("id", "a", "b")
    val out = df.select(
      LongArrayDot.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("slow")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
