package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native `DecimalType`-price extension (SURVEY §1.2 "float prices"):
  * the reference hard-wires `i64` prices and tells float users to scale
  * manually (reference README.md:145-158 — ported as
  * `BookColumns.scalePrice`). A decimal column carries an exact fixed
  * scale, so the engine can perform that scaling itself LOSSLESSLY:
  * multiply by 10^scale (exact decimal arithmetic), replay on longs
  * through the standard custom exec, and rescale the level-price
  * outputs back to the input decimal type. Doubles stay rejected with
  * the reference's reasoning — a binary float cannot guarantee the
  * round-trip.
  *
  * Scale shape: identical to the long operators (the decimal↔long
  * conversions are map-side column arithmetic fused into the existing
  * projections); the replay itself never sees a decimal. */
object DecimalPriceOps {

  def topNLevelsFromPriceUpdatesDecimal(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    val dt = priceType(df, price)
    withScaledPrices(df, Seq(price), dt) { (d, scaled) =>
      OrderBookOps.topNLevelsFromPriceUpdates(
        d, scaled(0), qty, isBid, n, partitionBy, orderBy)
    }
  }

  def topNLevelsFromPriceMutationsDecimal(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    val dt = priceType(df, price)
    withScaledPrices(df, Seq(price), dt) { (d, scaled) =>
      OrderBookOps.topNLevelsFromPriceMutations(
        d, scaled(0), qty, isBid, n, partitionBy, orderBy)
    }
  }

  def topNLevelsFromPriceMutationsWithModifyDecimal(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: String, prevQty: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    val dt = priceType(df, price)
    val pt = priceType(df, prevPrice)
    require(pt == dt,
      s"prev_price type $pt must equal price type $dt (one book, one scale)")
    withScaledPrices(df, Seq(price, prevPrice), dt) { (d, scaled) =>
      OrderBookOps.topNLevelsFromPriceMutationsWithModify(
        d, scaled(0), qty, isBid, scaled(1), prevQty, n, partitionBy, orderBy)
    }
  }

  private def priceType(df: DataFrame, c: String): DecimalType =
    df.schema(c).dataType match {
      case d: DecimalType =>
        // the scaled long carries ALL the digits (value × 10^scale), so
        // the bound is total precision — precision-minus-scale would
        // admit e.g. (20,2), whose scaled values exceed Long and the
        // non-ANSI Decimal→Long cast would WRAP silently, replaying a
        // garbage price with no exception
        require(d.precision <= 18,
          s"decimal price '$c' ($d): precision > 18 cannot scale to a long " +
            "losslessly — reduce precision or pre-scale explicitly")
        // the rescale multiply is typed (20,0)×(scale+1,scale) → precision
        // 21+scale, which must stay ≤ 38 or Spark's precision-loss
        // adjustment silently rounds the last fractional digit (e.g.
        // (18,18) would round digit 18) — both bounds are load-bearing
        require(d.scale <= 17,
          s"decimal price '$c' ($d): scale > 17 would overflow the exact " +
            "rescale's decimal precision and round silently")
        d
      case DoubleType | FloatType =>
        throw new IllegalArgumentException(
          s"float price column '$c' is not supported (reference refuses floats " +
            "too): scale to integers explicitly via BookColumns.scalePrice, or " +
            "use a DecimalType column for exact automatic scaling")
      case other =>
        throw new IllegalArgumentException(
          s"decimal overload requires a DecimalType price column, '$c' is $other")
    }

  /** Scale the given decimal price columns to long temps, run, rescale
    * every output level-price column back to `dt`. */
  private def withScaledPrices(df: DataFrame, priceCols: Seq[String],
      dt: DecimalType)(run: (DataFrame, Seq[String]) => DataFrame): DataFrame = {
    var factor = 1L
    (0 until dt.scale).foreach(_ => factor *= 10L)
    val temps = priceCols.indices.map(i => s"__dec_px$i")
    val clash = df.columns.toSet.intersect(temps.toSet)
    require(clash.isEmpty, s"input already has internal columns: $clash")
    val scaled = priceCols.zip(temps).foldLeft(df) { case (d, (c, t)) =>
      // decimal × integral literal is exact; the product is integral by
      // construction (value has scale ≤ dt.scale), so the long cast is
      // lossless
      d.withColumn(t, (col(c) * lit(factor)).cast(LongType))
    }
    val out = run(scaled, temps).drop(temps: _*)
    // long → decimal: multiply by the exact 10^-scale decimal literal
    // (multiplication never rounds; precision 20 + scale + 1 ≤ 38) and
    // cast back to the declared input type
    val inv = lit(BigDecimal(new java.math.BigDecimal(
      java.math.BigInteger.ONE, dt.scale)))
    out.columns.filter(_.matches("^(bid|ask)_price_\\d+$"))
      .foldLeft(out) { (d, c) =>
        d.withColumn(c, (col(c).cast(DecimalType(20, 0)) * inv).cast(dt))
      }
  }
}
