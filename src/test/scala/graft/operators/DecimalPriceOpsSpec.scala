package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §1.2 decimal-price extension: DecimalType prices replay
  * natively (exact scale → long replay → rescale), floats stay refused
  * with the reference's guidance. */
class DecimalPriceOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dec(s: String) = new java.math.BigDecimal(s)

  private val stream = Seq(
    (0L, "1.25", 10L, true),
    (1L, "1.50", 20L, true),
    (2L, "2.75", 30L, false),
    (3L, "2.50", 40L, false),
    (4L, "1.50", 0L, true)) // update: drain the 1.50 bid level
    .toDF("seq", "price_s", "qty", "is_bid")
    .withColumn("price", col("price_s").cast(DecimalType(10, 2)))
    .withColumn("product", lit("P"))
    .drop("price_s")

  test("decimal updates replay equals the manual scale-to-long recipe") {
    val outDf = DecimalPriceOps.topNLevelsFromPriceUpdatesDecimal(
      stream, "price", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
    // output price columns keep the INPUT decimal type
    assert(outDf.schema("bid_price_1").dataType == DecimalType(10, 2))
    assert(outDf.schema("bid_qty_1").dataType == LongType)
    val out = outDf.orderBy("seq").collect()

    def bp1(i: Int) = Option(out(i).getAs[java.math.BigDecimal]("bid_price_1"))
    def ap1(i: Int) = Option(out(i).getAs[java.math.BigDecimal]("ask_price_1"))
    assert(bp1(0).map(_.compareTo(dec("1.25")) == 0).contains(true))
    assert(bp1(1).map(_.compareTo(dec("1.50")) == 0).contains(true))
    assert(ap1(2).map(_.compareTo(dec("2.75")) == 0).contains(true))
    assert(ap1(3).map(_.compareTo(dec("2.50")) == 0).contains(true))
    assert(bp1(4).map(_.compareTo(dec("1.25")) == 0).contains(true),
      "draining 1.50 must fall back to the 1.25 level")

    // cross-check against the manual recipe on the same stream
    val manual = OrderBookOps.topNLevelsFromPriceUpdates(
        stream.withColumn("px", graft.operators.BookColumns.scalePrice(col("price"), 100L)),
        "px", "qty", "is_bid", 2, Seq("product"), Seq("seq"))
      .orderBy("seq").collect()
    out.indices.foreach { i =>
      val m = Option(manual(i).getAs[Long]("bid_price_1"))
        .filterNot(_ => manual(i).isNullAt(manual(i).fieldIndex("bid_price_1")))
      val d = bp1(i).map(_.movePointRight(2).longValueExact())
      assert(d == m, s"row $i")
    }
  }

  test("decimal mutations and modify variants run and rescale") {
    val mut = Seq(
      (0L, "1.25", 10L, true, None: Option[String], None: Option[Long]),
      (1L, "1.25", -10L, true, None: Option[String], None: Option[Long]),
      (2L, "3.00", 5L, false, None: Option[String], None: Option[Long]),
      (3L, "2.00", 5L, false, Some("3.00"), Some(5L)))
      .toDF("seq", "price_s", "qty", "is_bid", "prev_s", "prev_qty")
      .withColumn("price", col("price_s").cast(DecimalType(8, 2)))
      .withColumn("prev_price", col("prev_s").cast(DecimalType(8, 2)))
      .withColumn("product", lit("P")).drop("price_s", "prev_s")
    val m = DecimalPriceOps.topNLevelsFromPriceMutationsDecimal(
        mut.drop("prev_price", "prev_qty"), "price", "qty", "is_bid", 1,
        Seq("product"), Seq("seq"))
      .orderBy("seq").collect()
    assert(m(0).getAs[java.math.BigDecimal]("bid_price_1").compareTo(dec("1.25")) == 0)
    assert(m(1).isNullAt(m(1).fieldIndex("bid_price_1")), "delete drains the level")
    val mo = DecimalPriceOps.topNLevelsFromPriceMutationsWithModifyDecimal(
        mut, "price", "qty", "is_bid", "prev_price", "prev_qty", 1,
        Seq("product"), Seq("seq"))
      .orderBy("seq").collect()
    assert(mo(2).getAs[java.math.BigDecimal]("ask_price_1").compareTo(dec("3.00")) == 0)
    assert(mo(3).getAs[java.math.BigDecimal]("ask_price_1").compareTo(dec("2.00")) == 0,
      "modify must move the ask level from 3.00 to 2.00")
  }

  test("float prices are refused with the scale-explicitly guidance") {
    val floats = Seq((0L, 1.25, 10L, true)).toDF("seq", "price", "qty", "is_bid")
      .withColumn("product", lit("P"))
    val e = intercept[IllegalArgumentException] {
      DecimalPriceOps.topNLevelsFromPriceUpdatesDecimal(
        floats, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
    }
    assert(e.getMessage.contains("scalePrice"))
    // out-of-range decimals are refused too — including (20,2), whose 18
    // INTEGRAL digits would pass a precision-minus-scale check but whose
    // scaled values overflow a long (the non-ANSI cast would wrap
    // silently): the guard must bound TOTAL precision
    // ...and (18,18), whose rescale multiply would exceed decimal
    // precision 38 and round the 18th fractional digit silently
    for (dt <- Seq(DecimalType(38, 2), DecimalType(20, 2), DecimalType(18, 18))) {
      val wide = stream.withColumn("price", col("price").cast(dt))
      assertThrows[IllegalArgumentException] {
        DecimalPriceOps.topNLevelsFromPriceUpdatesDecimal(
          wide, "price", "qty", "is_bid", 1, Seq("product"), Seq("seq"))
      }
    }
  }
}
