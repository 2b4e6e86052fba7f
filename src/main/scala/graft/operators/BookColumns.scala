package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The README normalization recipes as library helpers (reference:
  * README.md:133-216) — everything a user needs to turn raw exchange
  * messages into the engine's mutation/update streams and back.
  */
object BookColumns {

  /** `side` string → `is_bid` boolean (reference README.md:147). */
  def isBidFromSide(side: Column, bidValue: String = "bid"): Column =
    (side === bidValue).as("is_bid")

  /** Message-type → signed qty: delete/trade messages negate the quantity
    * (reference README.md:149-151). */
  def signedQty(messageType: Column, qty: Column,
                negatingTypes: Seq[String] = Seq("delete", "trade")): Column =
    when(messageType.isin(negatingTypes.map(x => x: Any): _*), -qty).otherwise(qty)

  /** Float price → scaled long (reference README.md:148: multiply by a
    * factor, round, cast). */
  def scalePrice(price: Column, factor: Long): Column =
    round(price * factor).cast("long")

  /** Scaled long price back to float (reference README.md:158). */
  def unscalePrice(scaled: Column, factor: Long): Column =
    scaled.cast("double") / factor

  /** Un-scale every level-price column of a replay output in one go —
    * the regex-selector recipe (reference README.md:156-158). */
  def unscaleLevelPrices(df: DataFrame, factor: Long): DataFrame =
    df.columns.filter(_.matches("^(bid|ask)_price_\\d+$"))
      .foldLeft(df)((d, c) => d.withColumn(c, unscalePrice(col(c), factor)))

  /** Book-reset epochs: a running count of reset markers per product, for
    * use as an extra partition key so each epoch replays a fresh book
    * (reference README.md:201-216). */
  def resetEpoch(df: DataFrame, isResetCol: String, partitionBy: Seq[String],
                 orderBy: Seq[String], outCol: String = "reset_count"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, sum(col(isResetCol).cast("long")).over(w))
  }
}
