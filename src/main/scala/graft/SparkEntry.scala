package graft

import graft.operators.OrderBookOps
import graft.queries.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Replays the derived order-book stream (8 products in parallel) and
    * emits the top-2 levels per event. */
  def entry(spark: SparkSession): DataFrame = {
    val stream = EventStreams.bookStream(spark, "/root/testdata/sf0.001", qtyZeroEvery5 = true)
    OrderBookOps.topNLevelsFromPriceUpdates(
      stream, "price", "qty", "is_bid", n = 2,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bbo_updates_n1" -> ((s, dir) => bboUpdates(s, dir, 1)),
    "bbo_updates_n2" -> ((s, dir) => bboUpdates(s, dir, 2)),
    "bbo_mutations_n1" -> ((s, dir) => bboMutations(s, dir, 1)),
  )

  private def bboUpdates(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    val out = OrderBookOps.topNLevelsFromPriceUpdates(
      stream, "price", "qty", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
    out.select((Seq("product", "seq") ++ OrderBookOps.bboFieldNames(n)).map(col): _*)
  }

  private def bboMutations(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
    val out = OrderBookOps.topNLevelsFromPriceMutations(
      stream, "price", "qty", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
    out.select((Seq("product", "seq") ++ OrderBookOps.bboFieldNames(n)).map(col): _*)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The book-replay oracles rebuild per-row book state relationally: a
    * (row × level) grid joined to the update stream, with a running
    * last-set (updates) or running-sum (mutations) window giving each
    * level's quantity as of every row, then per-row top-N via
    * max/arg_max or ordered lists. O(rows × levels) — fine at the
    * verify scale factor, and an independent formulation from the
    * engine's incremental fold. */
  def oracleSql: Map[String, String] = Map(
    "bbo_updates_n1" -> bboUpdatesOracle(1),
    "bbo_updates_n2" -> bboUpdatesOracle(2),
    "bbo_mutations_n1" -> bboMutationsOracle(1),
  )

  private def gridAndState(streamSql: String, stateExpr: String): String =
    s"""WITH upd AS (
       |$streamSql
       |), grid AS (
       |  SELECT r.seq, r.product, l.is_bid, l.price
       |  FROM (SELECT seq, product FROM upd) r
       |  JOIN (SELECT DISTINCT product, is_bid, price FROM upd) l USING (product)
       |), state AS (
       |  SELECT g.seq, g.product, g.is_bid, g.price,
       |         $stateExpr OVER (
       |           PARTITION BY g.product, g.is_bid, g.price ORDER BY g.seq) AS qty
       |  FROM grid g LEFT JOIN upd u
       |    ON u.product = g.product AND u.is_bid = g.is_bid
       |   AND u.price = g.price AND u.seq = g.seq
       |)""".stripMargin

  private def topNSelect(n: Int): String =
    if (n == 1)
      """SELECT seq, product,
        |  max(price) FILTER (WHERE is_bid AND qty > 0) AS bid_price_1,
        |  arg_max(qty, price) FILTER (WHERE is_bid AND qty > 0) AS bid_qty_1,
        |  min(price) FILTER (WHERE NOT is_bid AND qty > 0) AS ask_price_1,
        |  arg_min(qty, price) FILTER (WHERE NOT is_bid AND qty > 0) AS ask_qty_1
        |FROM state GROUP BY seq, product""".stripMargin
    else {
      val proj = (1 to n).map(i => s"bp[$i] AS bid_price_$i") ++
        (1 to n).map(i => s"bq[$i] AS bid_qty_$i") ++
        (1 to n).map(i => s"ap[$i] AS ask_price_$i") ++
        (1 to n).map(i => s"aq[$i] AS ask_qty_$i")
      s""", lists AS (
         |  SELECT seq, product,
         |    list(price ORDER BY price DESC) FILTER (WHERE is_bid AND qty > 0) AS bp,
         |    list(qty ORDER BY price DESC) FILTER (WHERE is_bid AND qty > 0) AS bq,
         |    list(price ORDER BY price ASC) FILTER (WHERE NOT is_bid AND qty > 0) AS ap,
         |    list(qty ORDER BY price ASC) FILTER (WHERE NOT is_bid AND qty > 0) AS aq
         |  FROM state GROUP BY seq, product
         |)
         |SELECT seq, product, ${proj.mkString(", ")} FROM lists""".stripMargin
    }

  private def bboUpdatesOracle(n: Int): String = {
    val head = gridAndState(
      EventStreams.bookStreamSql(qtyZeroEvery5 = true),
      "last_value(u.qty IGNORE NULLS)")
    if (n == 1) s"$head\n${topNSelect(1)}" else s"$head${topNSelect(n)}"
  }

  private def bboMutationsOracle(n: Int): String = {
    val head = gridAndState(
      EventStreams.bookStreamSql(qtyZeroEvery5 = false),
      "sum(u.qty)")
    if (n == 1) s"$head\n${topNSelect(1)}" else s"$head${topNSelect(n)}"
  }
}
