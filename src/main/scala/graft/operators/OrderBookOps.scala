package graft.operators

import graft.core.{OrderBook, OrderBookException, Transitions}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native form of the reference's three public operators
  * (reference: polars_order_book/polars_order_book/__init__.py:22-210).
  *
  * The kernel is a per-group, strictly ordered, stateful 1-row-in →
  * 1-row-out fold, which Spark cannot express as an associative aggregate
  * (no valid merge). The idiomatic embodiment is a shuffle on the partition
  * keys followed by a sorted per-group fold:
  * `groupByKey(partitionBy).flatMapSortedGroups(orderBy)(replay)`.
  *
  * Scale model: one order book (= one `partitionBy` group, e.g. one
  * product) is replayed by exactly one task; distinct products replay in
  * parallel across the cluster. This mirrors the reference's contract that
  * multi-product frames must be processed under `group_by("product_id")`
  * (reference: README.md:184-197). Because row order is semantically
  * load-bearing and Spark shuffles destroy input order, the API *requires*
  * explicit order columns instead of trusting input order (the reference
  * trusts input order per README.md:182).
  *
  * Output: the input columns plus 4·n nullable LongType columns in the
  * reference's grouped field order `bid_price_1..n, bid_qty_1..n,
  * ask_price_1..n, ask_qty_1..n` (reference:
  * polars_order_book/src/output.rs:89-120).
  */
object OrderBookOps {

  /** bbo field names in the reference's grouped (materialized) order. */
  def bboFieldNames(n: Int): Seq[String] =
    (1 to n).map(i => s"bid_price_$i") ++ (1 to n).map(i => s"bid_qty_$i") ++
      (1 to n).map(i => s"ask_price_$i") ++ (1 to n).map(i => s"ask_qty_$i")

  private sealed trait Mode
  private case object Updates extends Mode
  private case object Mutations extends Mode
  private case object Modify extends Mode

  /** O1 — replay level snapshots: qty>0 sets the level's qty, qty==0
    * removes it. Reference: __init__.py:157-210,
    * polars_order_book/src/calculate_bbo.rs:127-170. */
  def topNLevelsFromPriceUpdates(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replayExec(df, price, qty, isBid, None, None, n, partitionBy, orderBy, 0)

  /** O2 — replay signed deltas: qty>0 adds, qty<0 deletes |qty|, qty==0
    * no-op. Reference: __init__.py:101-154, calculate_bbo.rs:172-215. */
  def topNLevelsFromPriceMutations(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replayExec(df, price, qty, isBid, None, None, n, partitionBy, orderBy, 1)

  /** O3 — as O2 plus modify (move/resize an order) when prev_price/prev_qty
    * are set; both-or-neither semantics per row enforced by the 9-case
    * transition table. Reference: __init__.py:22-98, calculate_bbo.rs:217-268,
    * update.rs:132-161. */
  def topNLevelsFromPriceMutationsWithModify(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: String, prevQty: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replayExec(df, price, qty, isBid, Some(prevPrice), Some(prevQty), n,
      partitionBy, orderBy, 2)

  // ---- Column-typed overloads ------------------------------------------
  // The reference's primary API accepts `pl.Expr | str` (_utils.py:15-52);
  // these accept arbitrary Column expressions for the event and key
  // arguments by materializing them as internal temp columns around the
  // string-based fast path (the temps never appear in the output).

  def topNLevelsFromPriceUpdates(
      df: DataFrame, price: Column, qty: Column, isBid: Column, n: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    viaTempColumns(df, Seq(price, qty, isBid), partitionBy, orderBy) {
      (d, ev, pb, ob) =>
        topNLevelsFromPriceUpdates(d, ev(0), ev(1), ev(2), n, pb, ob)
    }

  def topNLevelsFromPriceMutations(
      df: DataFrame, price: Column, qty: Column, isBid: Column, n: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    viaTempColumns(df, Seq(price, qty, isBid), partitionBy, orderBy) {
      (d, ev, pb, ob) =>
        topNLevelsFromPriceMutations(d, ev(0), ev(1), ev(2), n, pb, ob)
    }

  def topNLevelsFromPriceMutationsWithModify(
      df: DataFrame, price: Column, qty: Column, isBid: Column,
      prevPrice: Column, prevQty: Column, n: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    viaTempColumns(df, Seq(price, qty, isBid, prevPrice, prevQty),
      partitionBy, orderBy) { (d, ev, pb, ob) =>
      topNLevelsFromPriceMutationsWithModify(
        d, ev(0), ev(1), ev(2), ev(3), ev(4), n, pb, ob)
    }

  private def viaTempColumns(df: DataFrame, ev: Seq[Column],
      partitionBy: Seq[Column], orderBy: Seq[Column])
      (run: (DataFrame, Seq[String], Seq[String], Seq[String]) => DataFrame): DataFrame = {
    val evNames = ev.indices.map(i => s"__c_ev$i")
    val pbNames = partitionBy.indices.map(i => s"__c_pb$i")
    val obNames = orderBy.indices.map(i => s"__c_ob$i")
    val clash = df.columns.toSet.intersect((evNames ++ pbNames ++ obNames).toSet)
    require(clash.isEmpty, s"Input already has internal columns: $clash")
    val withAll = (evNames.zip(ev) ++ pbNames.zip(partitionBy) ++ obNames.zip(orderBy))
      .foldLeft(df) { case (d, (nm, c)) => d.withColumn(nm, c) }
    run(withAll, evNames, pbNames, obNames)
      .drop(evNames ++ pbNames ++ obNames: _*)
  }

  /** flatMapSortedGroups embodiments — kept as the cross-implementation
    * oracle for the custom physical operator (same results, Row-based). */
  def topNLevelsFromPriceUpdatesViaGroups(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replay(df, price, qty, isBid, None, None, n, partitionBy, orderBy, Updates)

  def topNLevelsFromPriceMutationsViaGroups(
      df: DataFrame, price: String, qty: String, isBid: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replay(df, price, qty, isBid, None, None, n, partitionBy, orderBy, Mutations)

  def topNLevelsFromPriceMutationsWithModifyViaGroups(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: String, prevQty: String, n: Int,
      partitionBy: Seq[String], orderBy: Seq[String]): DataFrame =
    replay(df, price, qty, isBid, Some(prevPrice), Some(prevQty), n,
      partitionBy, orderBy, Modify)

  /** Fast path: plan the replay as the custom BboReplayNode — Spark
    * inserts the (single) exchange + sort; the fold runs over UnsafeRows
    * in BboReplayExec. */
  private def replayExec(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: Option[String], prevQty: Option[String], n: Int,
      partitionBy: Seq[String], orderBy: Seq[String], mode: Int): DataFrame = {
    import graft.plans.{BboReplayNode, BboReplayStrategy}
    import org.apache.spark.sql.GraftColumnBridge
    // Contract parity with the reference: n outside 1..=20 is rejected with
    // the same message (calculate_bbo.rs:117-127). The core OrderBook
    // itself handles any n >= 1 — the bound is a public-API contract.
    require(n >= 1 && n <= 20, s"Unsupported number of levels: $n")
    require(orderBy.nonEmpty,
      "orderBy must be non-empty: Spark provides no implicit row order, and " +
        "book replay is order-sensitive (reference README.md:182)")
    val clash = df.columns.toSet.intersect(bboFieldNames(n).toSet)
    require(clash.isEmpty, s"Input already has output columns: $clash")

    val spark = df.sparkSession
    BboReplayStrategy.ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): catalyst.expressions.Attribute =
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"Column '$name' not found among ${analyzed.output.map(_.name).mkString(", ")}"))
    def asLong(name: String) = catalyst.expressions.Cast(attr(name), LongType)
    val node = BboReplayNode(
      mode, n,
      asLong(price),
      asLong(qty),
      catalyst.expressions.Cast(attr(isBid), BooleanType),
      prevPrice.map(asLong),
      prevQty.map(asLong),
      partitionBy.map(attr(_): catalyst.expressions.Expression),
      orderBy.map(attr(_): catalyst.expressions.Expression),
      BboReplayNode.mkBboAttrs(n),
      analyzed)
    GraftColumnBridge.ofRows(spark, node)
  }

  /** Re-assemble the flat bbo columns into a single struct column, the
    * reference's pre-`unnest` shape (reference: README.md:34). */
  def nestBbo(df: DataFrame, n: Int, outputCol: String = "bbo"): DataFrame = {
    val names = bboFieldNames(n)
    df.withColumn(outputCol, struct(names.map(col): _*)).drop(names: _*)
  }

  /** Spark equivalent of Polars `unnest` (reference: README.md:34, 67). */
  def unnestStruct(df: DataFrame, structCol: String): DataFrame =
    df.select(col("*"), col(structCol + ".*")).drop(structCol)

  private def replay(
      df: DataFrame, price: String, qty: String, isBid: String,
      prevPrice: Option[String], prevQty: Option[String], n: Int,
      partitionBy: Seq[String], orderBy: Seq[String], mode: Mode): DataFrame = {
    // Contract parity with the reference: n outside 1..=20 is rejected with
    // the same message (calculate_bbo.rs:117-127). The core OrderBook
    // itself handles any n >= 1 — the bound is a public-API contract.
    require(n >= 1 && n <= 20, s"Unsupported number of levels: $n")
    require(orderBy.nonEmpty,
      "orderBy must be non-empty: Spark provides no implicit row order, and " +
        "book replay is order-sensitive (reference README.md:182)")
    val clash = df.columns.toSet.intersect(bboFieldNames(n).toSet)
    require(clash.isEmpty, s"Input already has output columns: $clash")

    val outSchema = StructType(df.schema.fields ++
      bboFieldNames(n).map(StructField(_, LongType, nullable = true)))
    val numIn = df.schema.size

    // Internal casted event columns appended after the passthrough columns;
    // they are read by the fold and never emitted.
    val withEv0 = df
      .withColumn("__g_price", col(price).cast(LongType))
      .withColumn("__g_qty", col(qty).cast(LongType))
      .withColumn("__g_isbid", col(isBid).cast(BooleanType))
    val withEv = mode match {
      case Modify => withEv0
        .withColumn("__g_pprice", col(prevPrice.get).cast(LongType))
        .withColumn("__g_pqty", col(prevQty.get).cast(LongType))
      case _ => withEv0
    }
    val iPrice = numIn; val iQty = numIn + 1; val iBid = numIn + 2
    val iPPrice = numIn + 3; val iPQty = numIn + 4

    def replayGroup(it: Iterator[Row]): Iterator[Row] = {
      val book = new OrderBook(n)
      val width = numIn + 4 * n
      it.map { row =>
        if (row.isNullAt(iBid)) OrderBookException.missingValue(isBid)
        if (row.isNullAt(iPrice)) OrderBookException.missingValue(price)
        if (row.isNullAt(iQty)) OrderBookException.missingValue(qty)
        val b = row.getBoolean(iBid)
        val p = row.getLong(iPrice)
        val q = row.getLong(iQty)
        mode match {
          case Updates   => Transitions.applyUpdate(book, b, p, q)
          case Mutations => Transitions.applyMutation(book, b, p, q)
          case Modify =>
            val hasPP = !row.isNullAt(iPPrice)
            val hasPQ = !row.isNullAt(iPQty)
            Transitions.applyMutationWithModify(book, b, p, q,
              hasPP, if (hasPP) row.getLong(iPPrice) else 0L,
              hasPQ, if (hasPQ) row.getLong(iPQty) else 0L)
        }
        val out = new Array[Any](width)
        var i = 0
        while (i < numIn) { out(i) = row.get(i); i += 1 }
        book.snapshotInto(out, numIn)
        new GenericRowWithSchema(out, outSchema): Row
      }
    }

    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val sortCols = orderBy.map(col)

    if (partitionBy.isEmpty) {
      // Single global book: one group, one task. Valid but serial — callers
      // with multiple products should pass partition keys.
      withEv.groupByKey(_ => 0)(Encoders.scalaInt)
        .flatMapSortedGroups(sortCols: _*)((_, it) => replayGroup(it))
    } else {
      val keySchema = StructType(partitionBy.map(c =>
        df.schema(df.schema.fieldIndex(c))).toArray)
      val keyIdx = partitionBy.map(withEv.schema.fieldIndex).toArray
      val keyEnc: Encoder[Row] = Encoders.row(keySchema)
      withEv.groupByKey { r =>
        val vs = new Array[Any](keyIdx.length)
        var i = 0
        while (i < keyIdx.length) { vs(i) = r.get(keyIdx(i)); i += 1 }
        new GenericRowWithSchema(vs, keySchema): Row
      }(keyEnc).flatMapSortedGroups(sortCols: _*)((_, it) => replayGroup(it))
    }
  }
}
