package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL round-trip: the AsOfJoinSql-generated Spark SQL must produce
  * row-identical output to the Scala AsOfJoin API for every strategy ×
  * tolerance combination, including null-time left rows and keys with
  * no right rows. */
class AsOfJoinSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  test("sql form == scala form for backward/forward/nearest × tolerance") {
    val rnd = new scala.util.Random(31)
    val trades = ((0 until 400).map { i =>
      ("S" + rnd.nextInt(4), java.lang.Long.valueOf(rnd.nextInt(500).toLong), i.toLong)
    } :+ (("S0", null.asInstanceOf[java.lang.Long], 999L)))
      .toDF("sym", "t", "qty")
    val quotes = (0 until 150).map { i =>
      ("S" + rnd.nextInt(5), rnd.nextInt(500).toLong, 100L + i)
    }.toDF("sym", "t", "px")
    trades.createOrReplaceTempView("asof_sql_trades")
    quotes.createOrReplaceTempView("asof_sql_quotes")

    for (tol <- Seq(None, Some(20L))) {
      val scalaBack = AsOfJoin.joinAsOfBackward(trades, quotes, "t", Seq("sym"), Seq("px"), tol)
      val sqlBack = AsOfJoinSql.backward(spark, "asof_sql_trades", "asof_sql_quotes",
        "t", Seq("sym"), Seq("px"), tol)
      assert(canon(sqlBack) == canon(scalaBack), s"backward tol=$tol")

      val scalaFwd = AsOfJoin.joinAsOfForward(trades, quotes, "t", Seq("sym"), Seq("px"), tol)
      val sqlFwd = AsOfJoinSql.forward(spark, "asof_sql_trades", "asof_sql_quotes",
        "t", Seq("sym"), Seq("px"), tol)
      assert(canon(sqlFwd) == canon(scalaFwd), s"forward tol=$tol")

      val scalaNear = AsOfJoin.joinAsOfNearest(trades, quotes, "t", Seq("sym"), Seq("px"), tol)
      val sqlNear = AsOfJoinSql.nearest(spark, "asof_sql_trades", "asof_sql_quotes",
        "t", Seq("sym"), Seq("px"), tol)
      assert(canon(sqlNear) == canon(scalaNear), s"nearest tol=$tol")
    }
  }

  test("sql form keeps left multiplicity and column order") {
    Seq(("A", 1L, 10L), ("A", 1L, 11L)).toDF("sym", "t", "v")
      .createOrReplaceTempView("asof_sql_l2")
    Seq(("A", 1L, 7L)).toDF("sym", "t", "px")
      .createOrReplaceTempView("asof_sql_r2")
    val out = AsOfJoinSql.backward(spark, "asof_sql_l2", "asof_sql_r2",
      "t", Seq("sym"), Seq("px"))
    assert(out.columns.toSeq == Seq("sym", "t", "v", "px", "asof_t"))
    assert(out.count() == 2)
  }
}
