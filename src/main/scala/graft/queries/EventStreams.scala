package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of order-book event streams from the driver's
  * `events` table (TESTDATA.md). The arithmetic is intentionally expressible
  * identically in ANSI SQL so the DuckDB oracle can reproduce it bit-for-bit:
  * only int64 multiply/modulo on `event_id` and `user_id` — no hashing, no
  * floats.
  *
  * - `seq`     = event_id (the replay order; unique)
  * - `product` = user_id % 8 (8 independent books → 8-way parallel replay)
  * - `is_bid`  = event_id % 2 = 0
  * - `price`   = 50 + (event_id * 2654435761) % 45 (bounded level domain so
  *               books develop depth; multiplier is the Knuth/Fibonacci
  *               hashing constant, kept < 2^63 / max(event_id))
  * - `qty`     = 1 + (event_id * 48271) % 100 (48271 = MINSTD multiplier)
  *
  * For the *updates* stream, every 5th event sets qty = 0, exercising level
  * removal (a safe no-op when the level is absent, matching the reference's
  * set_level semantics). The *mutations* stream is adds-only: valid signed
  * deltas cannot be generated obliviously (deleting more than available is
  * an error by contract — reference order_book_core/src/book_side.rs:89-112);
  * delete/modify paths are covered by the golden tests instead.
  */
object EventStreams {

  /** `events` via the source layer (explicit schema; the TIMESTAMP(NANOS)
    * `ts` column is omitted there so it is never scanned). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "events")

  /** Common derived columns; `qtyZeroEvery5` selects the updates variant. */
  def bookStream(spark: SparkSession, sfDir: String, qtyZeroEvery5: Boolean): DataFrame = {
    val base = events(spark, sfDir)
      .select(
        col("event_id").as("seq"),
        (col("user_id") % 8).as("product"),
        (col("event_id") % 2 === 0).as("is_bid"),
        (lit(50) + (col("event_id") * lit(2654435761L)) % 45).as("price"),
        (lit(1) + (col("event_id") * lit(48271L)) % 100).as("qty_raw"))
    val withQty =
      if (qtyZeroEvery5)
        base.withColumn("qty",
          when((col("seq") * 97) % 5 === 0, lit(0L)).otherwise(col("qty_raw")))
      else base.withColumn("qty", col("qty_raw"))
    withQty.drop("qty_raw")
  }

  /** The same derivation as SQL text, for the DuckDB oracle CTE. */
  def bookStreamSql(qtyZeroEvery5: Boolean): String = {
    val qty =
      if (qtyZeroEvery5)
        "CASE WHEN (event_id * 97) % 5 = 0 THEN 0 ELSE 1 + (event_id * 48271) % 100 END"
      else "1 + (event_id * 48271) % 100"
    s"""SELECT event_id AS seq,
       |       user_id % 8 AS product,
       |       (event_id % 2 = 0) AS is_bid,
       |       50 + (event_id * 2654435761) % 45 AS price,
       |       $qty AS qty
       |FROM events""".stripMargin
  }
}
