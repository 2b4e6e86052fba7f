package graft.streaming

import graft.core.{BookCodec, OrderBook, OrderBookException, Transitions}
import graft.operators.OrderBookOps
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming form of the book replay: the same per-product fold,
  * with book state carried across micro-batches in the state store
  * (`flatMapGroupsWithState`).
  *
  * Ordering contract: rows are sorted by the order column *within each
  * micro-batch group* before folding (Spark provides no cross-batch
  * ordering — late events are the caller's watermarking problem, exactly
  * as the reference requires pre-sorted input, README.md:182). State is
  * the compact BookCodec encoding, so a 1000-executor cluster holds one
  * small blob per product, not per row.
  */
object OrderBookStream {

  /** Typed micro-batch event for the modify variant. */
  case class ModifyEvent(pkey: Long, okey: Long, price: Long, qty: Long,
                         isBid: Boolean, pp: Option[Long], pq: Option[Long])

  /** Streaming top-N-levels from price updates. `df` must be a streaming
    * DataFrame. Emits one row per input event (append mode).
    *
    * @param idleTimeout when set (e.g. "30 minutes"), a product's book
    *        state is EVICTED after that much processing time with no
    *        events — essential when the product universe is unbounded
    *        (delisted instruments, dead sessions) so the state store
    *        doesn't grow forever; a product re-appearing after eviction
    *        starts a fresh book. None = state lives for the lifetime of
    *        the query (bounded universes). */
  def topNLevelsFromPriceUpdates(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: String, orderBy: String,
      idleTimeout: Option[String] = None): DataFrame =
    replayStream(df, price, qty, isBid, n, partitionBy, orderBy,
      mutation = false, idleTimeout)

  def topNLevelsFromPriceMutations(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: String, orderBy: String,
      idleTimeout: Option[String] = None): DataFrame =
    replayStream(df, price, qty, isBid, n, partitionBy, orderBy,
      mutation = true, idleTimeout)

  /** Streaming O3: mutations with modify (nullable prev columns).
    * `idleTimeout` evicts idle products' book state like the O1/O2
    * variants. */
  def topNLevelsFromPriceMutationsWithModify(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: String, prevQty: String, n: Int,
      partitionBy: String, orderBy: String,
      idleTimeout: Option[String] = None): DataFrame = {

    val outSchema = StructType(
      StructField(partitionBy, LongType) +:
        StructField(orderBy, LongType) +:
        OrderBookOps.bboFieldNames(n).map(StructField(_, LongType, nullable = true)))

    def requireIntegral(c: String): Unit = {
      val t = df.schema(c).dataType
      require(t == LongType || t == IntegerType ||
        t == org.apache.spark.sql.types.ShortType ||
        t == org.apache.spark.sql.types.ByteType,
        s"column '$c' must be an integral type for the streaming replay " +
          s"(got ${t.catalogString})")
    }
    requireIntegral(partitionBy)
    requireIntegral(orderBy)

    val work = df.select(
      col(partitionBy).cast("long").as("pkey"),
      col(orderBy).cast("long").as("okey"),
      col(price).cast("long").as("price"),
      col(qty).cast("long").as("qty"),
      col(isBid).cast("boolean").as("isBid"),
      col(prevPrice).cast("long").as("pp"),
      col(prevQty).cast("long").as("pq"))

    val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    implicit val evEnc: Encoder[ModifyEvent] = Encoders.product[ModifyEvent]

    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    work.as[ModifyEvent]
      .groupByKey(_.pkey)(Encoders.scalaLong)
      .flatMapGroupsWithState[Array[Byte], Row](
        OutputMode.Append(), timeoutConf) {
        (key: Long, rows: Iterator[ModifyEvent], state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val book =
              if (state.exists) BookCodec.deserialize(state.get) else new OrderBook(n)
            val sorted = rows.toArray.sortBy(_.okey)
            val out = sorted.iterator.map { e =>
              Transitions.applyMutationWithModify(book, e.isBid, e.price, e.qty,
                e.pp.isDefined, e.pp.getOrElse(0L), e.pq.isDefined, e.pq.getOrElse(0L))
              val vals = new Array[Any](2 + 4 * n)
              vals(0) = key
              vals(1) = e.okey
              book.snapshotInto(vals, 2)
              new GenericRowWithSchema(vals, outSchema): Row
            }.toArray
            state.update(BookCodec.serialize(book))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }(Encoders.BINARY, rowEnc)
  }

  private def replayStream(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: String, orderBy: String, mutation: Boolean,
      idleTimeout: Option[String] = None): DataFrame = {

    val outSchema = StructType(
      StructField(partitionBy, LongType) +:
        StructField(orderBy, LongType) +:
        OrderBookOps.bboFieldNames(n).map(StructField(_, LongType, nullable = true)))

    def requireIntegral(c: String): Unit = {
      val t = df.schema(c).dataType
      require(t == LongType || t == IntegerType ||
        t == org.apache.spark.sql.types.ShortType ||
        t == org.apache.spark.sql.types.ByteType,
        s"column '$c' must be an integral type for the streaming replay " +
          s"(got ${t.catalogString}); fractional keys would silently merge " +
          "books / scramble order")
    }
    requireIntegral(partitionBy)
    requireIntegral(orderBy)
    val work = df.select(
      col(partitionBy).cast("long").as("pkey"),
      col(orderBy).cast("long").as("okey"),
      col(price).cast("long").as("price"),
      col(qty).cast("long").as("qty"),
      col(isBid).cast("boolean").as("is_bid"))

    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val tupEnc: Encoder[(Long, Long, Long, Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaBoolean)

    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    work.as[(Long, Long, Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], Row](
        OutputMode.Append(), timeoutConf) {
        (key: Long, rows: Iterator[(Long, Long, Long, Long, Boolean)],
         state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) {
            // idle product: drop the book; a later re-appearance replays
            // from a fresh (empty) book
            state.remove()
            Iterator.empty
          } else {
            val book =
              if (state.exists) BookCodec.deserialize(state.get) else new OrderBook(n)
            // fold in order within this micro-batch
            val sorted = rows.toArray.sortBy(_._2)
            val out = sorted.iterator.map { case (_, okey, p, q, b) =>
              if (mutation) Transitions.applyMutation(book, b, p, q)
              else Transitions.applyUpdate(book, b, p, q)
              val vals = new Array[Any](2 + 4 * n)
              vals(0) = key
              vals(1) = okey
              book.snapshotInto(vals, 2)
              new GenericRowWithSchema(vals, outSchema): Row
            }.toArray
            state.update(BookCodec.serialize(book))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }(Encoders.BINARY, rowEnc)
  }
}
