package graft

import graft.operators.OrderBookOps
import graft.queries.{EventStreams, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query surface lives in graft.queries.Registry; each entry pairs a
  * DataFrame implementation with a DuckDB oracle where SQL-expressible. */
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
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
