package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL round-trips: RelationalSql-generated Spark SQL must match the
  * Scala operators row-for-row, including sentinel intervals (fallback
  * branch) and session key boundaries. */
class RelationalSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  test("range join sql == scala form incl. sentinel fallback") {
    val rnd = new scala.util.Random(41)
    val left = (0 until 250).map(i =>
      ("K" + rnd.nextInt(3), rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lv")
    val right = (0 until 90).map { i =>
      val s = rnd.nextInt(1000).toLong
      val e = if (i % 9 == 0) Long.MaxValue else s + 1 + rnd.nextInt(150)
      ("K" + rnd.nextInt(3), s, e, i.toLong)
    }.toDF("k", "s", "e", "rv")
    left.createOrReplaceTempView("rjs_left")
    right.createOrReplaceTempView("rjs_right")
    val viaScala = RangeJoin.joinPointInInterval(left, right, "t", "s", "e",
        Seq("k"), binWidth = 16L, maxFanOut = 8L)
      .select("k", "t", "lv", "s", "e", "rv")
    val viaSql = RelationalSql.rangeJoin(spark, "rjs_left", "rjs_right",
        "t", "s", "e", Seq("k"), binWidth = 16L, maxFanOut = 8L)
      .select("k", "t", "lv", "s", "e", "rv")
    assert(canon(viaSql) == canon(viaScala))
  }

  test("sessionize sql == scala form") {
    val rnd = new scala.util.Random(43)
    val df = (0 until 300).map(i =>
      ("u" + rnd.nextInt(5), rnd.nextInt(2000).toLong))
      .toDF("user", "t")
    df.createOrReplaceTempView("sjs_events")
    val viaScala = Sessionize.withSessionIds(df, "t", Seq("user"), maxGap = 40L)
    val viaSql = RelationalSql.sessionize(spark, "sjs_events", "t",
      Seq("user"), maxGap = 40L)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(canon(viaSql) == canon(viaScala))
  }
}
