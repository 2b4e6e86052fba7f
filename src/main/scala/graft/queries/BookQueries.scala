package graft.queries

import graft.operators.OrderBookOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-book replay queries over the derived events stream — the
  * reference's entire public surface (SURVEY.md §2.1: O1/O2/O3), exercised
  * at driver scale with relational DuckDB oracles. */
object BookQueries {

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("bbo_updates_n1", (s, d) => bboUpdates(s, d, 1), Some(updatesOracle(1)), bench = true),
    GraftQuery("bbo_updates_n2", (s, d) => bboUpdates(s, d, 2), Some(updatesOracle(2)), bench = true),
    GraftQuery("bbo_updates_n5", (s, d) => bboUpdates(s, d, 5), Some(updatesOracle(5)), bench = true),
    GraftQuery("bbo_mutations_n1", (s, d) => bboMutations(s, d, 1), Some(mutationsOracle(1)), bench = true),
    GraftQuery("bbo_mutations_n2", (s, d) => bboMutations(s, d, 2), Some(mutationsOracle(2))),
    // O2 with REAL deletes: within each (product, side, slot) chain the
    // odd rows add and the even rows delete exactly the preceding add
    // (lag), so inventory never goes negative and levels fill AND fully
    // drain — the reference's fill-and-drain cycles
    // (test_calculate_bbo.py:71-127) at driver scale.
    GraftQuery("bbo_mutations_deletes_n2", (s, d) => bboMutationsDeletes(s, d, 2),
      Some(mutationsDeletesOracle(2))),
    // O3 fed all-null prevs must equal plain mutations (reference
    // test_calculate_bbo.py:194-259) — so the O2 oracle IS the O3 oracle.
    GraftQuery("bbo_modify_nullprev_n2", (s, d) => bboModifyNullPrev(s, d, 2), Some(mutationsOracle(2))),
    // parallel-prefix replay is output-identical to the serial fold, so it
    // shares the serial oracle.
    GraftQuery("bbo_parallel_updates_n2", (s, d) => bboParallelUpdates(s, d, 2), Some(updatesOracle(2))),
    // the SQL surface (registered window aggregate) shares the oracle too
    GraftQuery("bbo_sql_updates_n1", bboSqlUpdates, Some(updatesOracle(1))),
    GraftQuery("bbo_sql_updates_n2", (s, d) => bboSqlUpdatesN(s, d, 2), Some(updatesOracle(2))),
    // O3 with REAL modifies: each (product, side, slot) tracks one order
    // whose previous (price, qty) comes from lag() over its own history —
    // a valid modify stream derived obliviously from events.
    GraftQuery("bbo_modify_real_n2", (s, d) => bboModifyReal(s, d, 2), Some(modifyRealOracle(2))),
    // O3 through the parallel-prefix path: modifies decompose into
    // row-local level deltas (ParallelReplay.modifyDeltas mirrors
    // update.rs:132-161), so segment net states stay sum-decomposable and
    // the parallel replay is output-identical to serial — same oracle.
    GraftQuery("bbo_parallel_modify_n2", (s, d) => bboParallelModify(s, d, 2),
      Some(modifyRealOracle(2))),
    // the AUTO-segmented parallel path (segments chosen from data
    // statistics) — previously spec-only; same serial oracle
    GraftQuery("bbo_parallel_auto_n2", (s, d) => bboParallelAuto(s, d, 2),
      Some(updatesOracle(2))),
    // the window-aggregate embodiment (TypedImperativeAggregate over a
    // running frame) — previously equivalence-spec-only
    GraftQuery("bbo_window_updates_n2", (s, d) => bboWindowUpdates(s, d, 2),
      Some(updatesOracle(2))),
    // O1 over native DecimalType prices (the SURVEY §1.2 extension):
    // exact in-engine scale → long replay → rescale
    GraftQuery("bbo_decimal_n2", (s, d) => bboDecimalUpdates(s, d, 2),
      Some(decimalUpdatesOracle(2))),
    // day-boundary checkpoint/resume: resuming day 2 from the persisted
    // day-1 book state must equal the FULL replay's day-2 rows — so the
    // oracle is the plain updates oracle with a seq filter
    GraftQuery("bbo_resume_n2", (s, d) => bboResume(s, d, 2),
      Some(resumeOracle(2))),
    // the same checkpoint/resume law over the O2 (signed-mutation)
    // transition
    GraftQuery("bbo_resume_mutations_n2", (s, d) => bboResumeMutations(s, d, 2),
      Some(resumeMutationsOracle(2))),
    // ...and over the O3 (modify) transition — all three reference entry
    // points (update.rs:95-163) now share the serving lifecycle. Day-2
    // modifies whose prev points at day-1 history fold correctly because
    // the transition reads only the restored book, never the history.
    GraftQuery("bbo_resume_modify_n2", (s, d) => bboResumeModify(s, d, 2),
      Some(resumeModifyOracle(2))),
    // downstream microstructure analytics composed ON the replay output —
    // what the reference's users compute FROM top-of-book (the reference
    // stops at the levels themselves). Fixed-point int64 throughout.
    GraftQuery("q_bbo_microprice",
      (s, d) => graft.operators.BookAnalytics.microprice(bboUpdates(s, d, 1)),
      Some(micropriceOracle)),
    GraftQuery("q_bbo_twa_spread",
      (s, d) => graft.operators.BookAnalytics.timeWeightedSpread(bboUpdates(s, d, 1)),
      Some(twaSpreadOracle)),
    GraftQuery("q_bbo_ofi",
      (s, d) => graft.operators.BookAnalytics.orderFlowImbalance(bboUpdates(s, d, 1)),
      Some(ofiOracle)),
    // multi-level depth imbalance (top-5 resting qty per side) and
    // per-product exact spread quantiles — further replay compositions
    GraftQuery("q_bbo_depth_n5",
      (s, d) => graft.operators.BookAnalytics.depthImbalance(bboUpdates(s, d, 5), 5),
      Some(depthOracle(5))),
    GraftQuery("q_bbo_realized_var",
      (s, d) => graft.operators.BookAnalytics.realizedVariance(bboUpdates(s, d, 1)),
      Some(realizedVarOracle)),
    GraftQuery("q_bbo_spread_quantiles",
      (s, d) => graft.pipeline.StatsOps.exactQuantilesByGroup(
        bboUpdates(s, d, 1), Seq("product"),
        col("ask_price_1") - col("bid_price_1"), SPREAD_QUANTILES),
      Some(spreadQuantilesOracle)),
  )

  private val SPREAD_QUANTILES = Seq(100, 500, 900)

  /** Valid modify stream: slot = (event_id*31)%4 names "the order" being
    * modified within (product, side); lag over the slot's history gives
    * the exact previous (price, qty), so prev always matches book state
    * (first event per slot = plain add with null prevs). */
  def bboModifyReal(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
      .withColumn("slot", (col("seq") * 31) % 4)
    val w = Window.partitionBy(col("product"), col("is_bid"), col("slot"))
      .orderBy(col("seq"))
    val stream = base
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("prev_qty", lag(col("qty"), 1).over(w))
    OrderBookOps.topNLevelsFromPriceMutationsWithModify(
      stream, "price", "qty", "is_bid", "prev_price", "prev_qty", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  /** Oracle: explode each modify into its level deltas (+qty@price,
    * −prev_qty@prev_price), pre-aggregate per (seq, level), then the
    * standard grid + running-sum state reconstruction. */
  def modifyRealOracle(n: Int): String =
    s"""WITH ev AS (
       |${EventStreams.bookStreamSql(qtyZeroEvery5 = false)}
       |), sl AS (
       |  SELECT *, (seq * 31) % 4 AS slot FROM ev
       |), mods AS (
       |  SELECT *, lag(price) OVER w AS prev_price, lag(qty) OVER w AS prev_qty
       |  FROM sl WINDOW w AS (PARTITION BY product, is_bid, slot ORDER BY seq)
       |), deltas AS (
       |  SELECT seq, product, is_bid, price, qty FROM mods
       |  UNION ALL
       |  SELECT seq, product, is_bid, prev_price AS price, -prev_qty AS qty
       |  FROM mods WHERE prev_price IS NOT NULL
       |), upd AS (
       |  SELECT seq, product, is_bid, price, sum(qty) AS qty
       |  FROM deltas GROUP BY seq, product, is_bid, price
       |), grid AS (
       |  SELECT r.seq, r.product, l.is_bid, l.price
       |  FROM (SELECT seq, product FROM mods) r
       |  JOIN (SELECT DISTINCT product, is_bid, price FROM upd) l USING (product)
       |), state AS (
       |  SELECT g.seq, g.product, g.is_bid, g.price,
       |         CAST(sum(u.qty) OVER (
       |           PARTITION BY g.product, g.is_bid, g.price ORDER BY g.seq)
       |           AS BIGINT) AS qty
       |  FROM grid g LEFT JOIN upd u
       |    ON u.product = g.product AND u.is_bid = g.is_bid
       |   AND u.price = g.price AND u.seq = g.seq
       |)""".stripMargin + topNSelect(n)

  /** The same replay via the registered SQL window function — exercises
    * the spark.sql surface end-to-end. */
  def bboSqlUpdates(spark: SparkSession, sfDir: String): DataFrame =
    bboSqlUpdatesN(spark, sfDir, 1)

  /** SQL surface at arbitrary n: the bbo struct's grouped fields are
    * pulled out by name, mirroring the reference's unnest recipe. */
  def bboSqlUpdatesN(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
      .createOrReplaceTempView("graft_book_stream_n")
    val fields = OrderBookOps.bboFieldNames(n).map(f => s"bbo.$f").mkString(", ")
    spark.sql(
      s"""SELECT seq, product, $fields
         |FROM (
         |  SELECT seq, product, bbo_from_price_updates(price, qty, is_bid, $n) OVER (
         |    PARTITION BY product ORDER BY seq
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bbo
         |  FROM graft_book_stream_n
         |)""".stripMargin)
  }

  /** The bbo_modify_real stream replayed through the parallel-prefix
    * path (8 segments per product). */
  def bboParallelModify(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
      .withColumn("slot", (col("seq") * 31) % 4)
    val w = Window.partitionBy(col("product"), col("is_bid"), col("slot"))
      .orderBy(col("seq"))
    val stream = base
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("prev_qty", lag(col("qty"), 1).over(w))
    graft.operators.ParallelReplay.topNLevelsFromPriceMutationsWithModifyParallel(
        stream, "price", "qty", "is_bid", "prev_price", "prev_qty", n,
        "product", "seq", segments = 8)
      .select(proj(n).map(col): _*)
  }

  def bboParallelAuto(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    graft.operators.ParallelReplay.topNLevelsFromPriceUpdatesParallelAuto(
        stream, "price", "qty", "is_bid", n, "product", "seq",
        minRowsPerSegment = 256L) // low floor so driver-scale data actually segments
      .select(proj(n).map(col): _*)
  }

  def bboWindowUpdates(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    val bbo = graft.plans.BboWindow.fromPriceUpdates(
      col("price"), col("qty"), col("is_bid"), n,
      Seq(col("product")), Seq(col("seq")))
    stream.withColumn("__bbo", bbo)
      .select(col("product") +: col("seq") +:
        OrderBookOps.bboFieldNames(n).map(f => col(s"__bbo.$f").as(f)): _*)
  }

  def bboParallelUpdates(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    graft.operators.ParallelReplay.topNLevelsFromPriceUpdatesParallel(
        stream, "price", "qty", "is_bid", n, "product", "seq", segments = 8)
      .select(proj(n).map(col): _*)
  }

  private def proj(n: Int) = Seq("product", "seq") ++ OrderBookOps.bboFieldNames(n)

  /** Day-boundary checkpoint/resume (graft.operators.BookCheckpoint):
    * day 1 (seq < max(seq)/2) folds into one persisted book state per
    * product; day 2 resumes from it. The split point is computed from
    * the data identically on both engines (a planning-time max). */
  def bboResume(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import graft.operators.BookCheckpoint
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    val split = stream.agg(max(col("seq"))).collect()(0).getLong(0) / 2
    val day1 = stream.filter(col("seq") < split)
    val day2 = stream.filter(col("seq") >= split)
    val state = BookCheckpoint.bookStateSnapshots(day1,
      "price", "qty", "is_bid", n, Seq("product"), Seq("seq"))
    BookCheckpoint.resumeTopNLevelsFromPriceUpdates(day2, state,
      "price", "qty", "is_bid", n, Seq("product"), Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  def resumeOracle(n: Int): String =
    s"""SELECT * FROM (
       |${updatesOracle(n)}
       |) WHERE seq >= (SELECT max(seq) // 2 FROM (
       |${EventStreams.bookStreamSql(qtyZeroEvery5 = true)}
       |))""".stripMargin

  /** O2 day-boundary checkpoint/resume — same law, mutation fold. */
  def bboResumeMutations(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import graft.operators.BookCheckpoint
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
    val split = stream.agg(max(col("seq"))).collect()(0).getLong(0) / 2
    val day1 = stream.filter(col("seq") < split)
    val day2 = stream.filter(col("seq") >= split)
    val state = BookCheckpoint.bookStateSnapshotsFromMutations(day1,
      "price", "qty", "is_bid", n, Seq("product"), Seq("seq"))
    BookCheckpoint.resumeTopNLevelsFromPriceMutations(day2, state,
      "price", "qty", "is_bid", n, Seq("product"), Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  /** O3 day-boundary checkpoint/resume: the bbo_modify_real stream (prev
    * columns from lag over the FULL per-slot history, so day-2 rows may
    * modify orders placed on day 1) split at max(seq)/2; day 1 folds into
    * a per-product state via the modify transition, day 2 resumes from
    * it. Oracle = the full modify replay's day-2 rows. */
  def bboResumeModify(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import graft.operators.BookCheckpoint
    import org.apache.spark.sql.expressions.Window
    val base = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
      .withColumn("slot", (col("seq") * 31) % 4)
    val w = Window.partitionBy(col("product"), col("is_bid"), col("slot"))
      .orderBy(col("seq"))
    val stream = base
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("prev_qty", lag(col("qty"), 1).over(w))
    val split = stream.agg(max(col("seq"))).collect()(0).getLong(0) / 2
    val day1 = stream.filter(col("seq") < split)
    val day2 = stream.filter(col("seq") >= split)
    val state = BookCheckpoint.bookStateSnapshotsFromMutationsWithModify(day1,
      "price", "qty", "is_bid", "prev_price", "prev_qty", n,
      Seq("product"), Seq("seq"))
    BookCheckpoint.resumeTopNLevelsFromPriceMutationsWithModify(day2, state,
      "price", "qty", "is_bid", "prev_price", "prev_qty", n,
      Seq("product"), Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  def resumeModifyOracle(n: Int): String =
    s"""SELECT * FROM (
       |${modifyRealOracle(n)}
       |) WHERE seq >= (SELECT max(seq) // 2 FROM (
       |${EventStreams.bookStreamSql(qtyZeroEvery5 = false)}
       |))""".stripMargin

  def resumeMutationsOracle(n: Int): String =
    s"""SELECT * FROM (
       |${mutationsOracle(n)}
       |) WHERE seq >= (SELECT max(seq) // 2 FROM (
       |${EventStreams.bookStreamSql(qtyZeroEvery5 = false)}
       |))""".stripMargin

  def bboUpdates(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
    OrderBookOps.topNLevelsFromPriceUpdates(
      stream, "price", "qty", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  def bboMutations(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
    OrderBookOps.topNLevelsFromPriceMutations(
      stream, "price", "qty", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  /** Valid delete-bearing O2 stream: chain = (product, is_bid, slot);
    * row_number odd → add (price, qty), even → delete the chain's
    * immediately preceding add (price/qty via lag). Every delete is
    * backed by its own chain's prior add at the same price, and chain
    * inventories are non-negative at every prefix, so the summed book
    * never over-deletes — ~50% deletes, levels drain to zero and refill. */
  def bboMutationsDeletes(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
      .withColumn("slot", (col("seq") * 31) % 4)
    val w = Window.partitionBy(col("product"), col("is_bid"), col("slot"))
      .orderBy(col("seq"))
    val stream = base
      .withColumn("rn", row_number().over(w))
      .withColumn("p_eff",
        when(col("rn") % 2 === 0, lag(col("price"), 1).over(w)).otherwise(col("price")))
      .withColumn("q_eff",
        when(col("rn") % 2 === 0, -lag(col("qty"), 1).over(w)).otherwise(col("qty")))
    OrderBookOps.topNLevelsFromPriceMutations(
      stream, "p_eff", "q_eff", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  def mutationsDeletesOracle(n: Int): String = {
    val streamSql =
      s"""SELECT seq, product, is_bid,
         |  CASE WHEN rn % 2 = 0 THEN pprice ELSE price END AS price,
         |  CASE WHEN rn % 2 = 0 THEN -pqty ELSE qty END AS qty
         |FROM (
         |  SELECT *, row_number() OVER w AS rn,
         |         lag(price) OVER w AS pprice, lag(qty) OVER w AS pqty
         |  FROM (SELECT *, (seq * 31) % 4 AS slot FROM (
         |${EventStreams.bookStreamSql(qtyZeroEvery5 = false)}
         |  ))
         |  WINDOW w AS (PARTITION BY product, is_bid, slot ORDER BY seq)
         |)""".stripMargin
    gridAndState(streamSql, "sum(u.qty)") + topNSelect(n)
  }

  def bboModifyNullPrev(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = false)
      .withColumn("prev_price", lit(null).cast("long"))
      .withColumn("prev_qty", lit(null).cast("long"))
    OrderBookOps.topNLevelsFromPriceMutationsWithModify(
      stream, "price", "qty", "is_bid", "prev_price", "prev_qty", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
      .select(proj(n).map(col): _*)
  }

  // ---- DuckDB oracles: rebuild per-row book state relationally ----------

  // The running-state qty is CAST back to BIGINT: DuckDB promotes sum()
  // to HUGEINT, the driver's value hash is type-sensitive, and Spark
  // emits BIGINT qty — the q_pack_contexts/q_ngram_familiarity drift
  // class, normalized at the source so tools/check_oracle.py's type
  // gate holds with zero exceptions.
  private def gridAndState(streamSql: String, stateExpr: String): String =
    s"""WITH upd AS (
       |$streamSql
       |), grid AS (
       |  SELECT r.seq, r.product, l.is_bid, l.price
       |  FROM (SELECT seq, product FROM upd) r
       |  JOIN (SELECT DISTINCT product, is_bid, price FROM upd) l USING (product)
       |), state AS (
       |  SELECT g.seq, g.product, g.is_bid, g.price,
       |         CAST($stateExpr OVER (
       |           PARTITION BY g.product, g.is_bid, g.price ORDER BY g.seq)
       |           AS BIGINT) AS qty
       |  FROM grid g LEFT JOIN upd u
       |    ON u.product = g.product AND u.is_bid = g.is_bid
       |   AND u.price = g.price AND u.seq = g.seq
       |)""".stripMargin

  private[queries] def topNSelect(n: Int,
      priceOut: String => String = identity): String =
    if (n == 1)
      s"""
        |SELECT seq, product,
        |  ${priceOut("max(price) FILTER (WHERE is_bid AND qty > 0)")} AS bid_price_1,
        |  arg_max(qty, price) FILTER (WHERE is_bid AND qty > 0) AS bid_qty_1,
        |  ${priceOut("min(price) FILTER (WHERE NOT is_bid AND qty > 0)")} AS ask_price_1,
        |  arg_min(qty, price) FILTER (WHERE NOT is_bid AND qty > 0) AS ask_qty_1
        |FROM state GROUP BY seq, product""".stripMargin
    else {
      val cols = (1 to n).map(i => s"${priceOut(s"bp[$i]")} AS bid_price_$i") ++
        (1 to n).map(i => s"bq[$i] AS bid_qty_$i") ++
        (1 to n).map(i => s"${priceOut(s"ap[$i]")} AS ask_price_$i") ++
        (1 to n).map(i => s"aq[$i] AS ask_qty_$i")
      s""", lists AS (
         |  SELECT seq, product,
         |    list(price ORDER BY price DESC) FILTER (WHERE is_bid AND qty > 0) AS bp,
         |    list(qty ORDER BY price DESC) FILTER (WHERE is_bid AND qty > 0) AS bq,
         |    list(price ORDER BY price ASC) FILTER (WHERE NOT is_bid AND qty > 0) AS ap,
         |    list(qty ORDER BY price ASC) FILTER (WHERE NOT is_bid AND qty > 0) AS aq
         |  FROM state GROUP BY seq, product
         |)
         |SELECT seq, product, ${cols.mkString(", ")} FROM lists""".stripMargin
    }

  def updatesOracle(n: Int): String =
    gridAndState(EventStreams.bookStreamSql(qtyZeroEvery5 = true),
      "last_value(u.qty IGNORE NULLS)") + topNSelect(n)

  /** O1 with native DECIMAL(12,2) prices (price/100) through
    * DecimalPriceOps — the oracle replays on the original longs and
    * divides the level prices at the very end; matching hashes prove the
    * decimal scale/replay/rescale round-trip is exact. Output prices are
    * double-cast on both engines (decimal→double and bigint-double/100
    * are the same correctly-rounded value; cross-engine decimal128
    * representation is not hash-stable). */
  def bboDecimalUpdates(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stream = EventStreams.bookStream(spark, sfDir, qtyZeroEvery5 = true)
      .withColumn("price_dec",
        (col("price").cast(DecimalType(14, 2)) * lit(BigDecimal("0.01")))
          .cast(DecimalType(12, 2)))
    val out = graft.operators.DecimalPriceOps.topNLevelsFromPriceUpdatesDecimal(
      stream, "price_dec", "qty", "is_bid", n,
      partitionBy = Seq("product"), orderBy = Seq("seq"))
    out.columns.filter(_.matches("^(bid|ask)_price_\\d+$"))
      .foldLeft(out)((d, c) => d.withColumn(c, col(c).cast("double")))
      .select(proj(n).map(col): _*)
  }

  def decimalUpdatesOracle(n: Int): String =
    gridAndState(EventStreams.bookStreamSql(qtyZeroEvery5 = true),
      "last_value(u.qty IGNORE NULLS)") +
      topNSelect(n, p => s"CAST($p AS DOUBLE) / 100")

  def mutationsOracle(n: Int): String =
    gridAndState(EventStreams.bookStreamSql(qtyZeroEvery5 = false),
      "sum(u.qty)") + topNSelect(n)

  // ---- book-analytics oracles: the n=1 replay as a CTE + arithmetic ----

  /** The full updates-replay oracle at any n wrapped as a `bbo` CTE so
    * the analytics oracles can SELECT from it — proving the composition,
    * not just the arithmetic. (topNSelect's n>1 form carries its own
    * `lists` CTE ahead of the final select; the split keeps it.) */
  private def bboCte(n: Int): String = {
    val body = topNSelect(n)
    val cut = body.lastIndexOf("SELECT seq, product")
    val (pre, fin) = body.splitAt(cut)
    gridAndState(EventStreams.bookStreamSql(qtyZeroEvery5 = true),
      "last_value(u.qty IGNORE NULLS)") +
      pre + s", bbo AS (\n$fin\n)"
  }

  private def bboCte1: String = bboCte(1)

  /** All divisions have positive operands, so DuckDB `//` (floor) and
    * Spark `div` (truncate) agree; NULL book sides propagate to NULL
    * analytics identically in both engines. */
  def micropriceOracle: String =
    s"""$bboCte1
       |SELECT product, seq,
       |  ask_price_1 - bid_price_1 AS spread,
       |  CAST((bid_qty_1 * 1000) // (bid_qty_1 + ask_qty_1) AS BIGINT)
       |    AS imbalance_permille,
       |  CAST(((bid_price_1 * ask_qty_1 + ask_price_1 * bid_qty_1) * 1000000)
       |    // (bid_qty_1 + ask_qty_1) AS BIGINT) AS microprice_e6
       |FROM bbo""".stripMargin

  def twaSpreadOracle: String =
    s"""$bboCte1, sp AS (
       |  SELECT product, seq,
       |    ask_price_1 - bid_price_1 AS sp,
       |    lead(seq) OVER (PARTITION BY product ORDER BY seq) - seq AS dt
       |  FROM bbo
       |)
       |SELECT product,
       |  count(*) AS n_events,
       |  CAST(sum(CASE WHEN sp IS NOT NULL AND dt IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_quoted,
       |  CAST(sum(CASE WHEN sp IS NOT NULL THEN dt END) AS BIGINT)
       |    AS quoted_ticks,
       |  CAST((sum(CASE WHEN sp IS NOT NULL THEN sp * dt END) * 1000)
       |    // sum(CASE WHEN sp IS NOT NULL THEN dt END) AS BIGINT)
       |    AS twa_spread_permille
       |FROM sp GROUP BY product""".stripMargin

  def depthOracle(n: Int): String = {
    val bid = (1 to n).map(i => s"coalesce(bid_qty_$i, 0)").mkString(" + ")
    val ask = (1 to n).map(i => s"coalesce(ask_qty_$i, 0)").mkString(" + ")
    s"""${bboCte(n)}
       |SELECT product, seq,
       |  CAST($bid AS BIGINT) AS bid_depth,
       |  CAST($ask AS BIGINT) AS ask_depth,
       |  CASE WHEN ($bid) + ($ask) > 0
       |       THEN CAST((($bid) * 1000) // (($bid) + ($ask)) AS BIGINT)
       |  END AS depth_imbalance_permille
       |FROM bbo""".stripMargin
  }

  def realizedVarOracle: String =
    s"""$bboCte1, q AS (
       |  SELECT product, seq, bid_price_1 + ask_price_1 AS m2 FROM bbo
       |  WHERE bid_price_1 IS NOT NULL AND ask_price_1 IS NOT NULL
       |), dd AS (
       |  SELECT product,
       |    m2 - lag(m2) OVER (PARTITION BY product ORDER BY seq) AS d
       |  FROM q
       |)
       |SELECT product, count(*) AS n_quotes,
       |  CAST(sum(CASE WHEN d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_moves,
       |  CAST(coalesce(sum(d * d), 0) AS BIGINT) AS rv_x4
       |FROM dd GROUP BY product""".stripMargin

  def spreadQuantilesOracle: String =
    s"""$bboCte1, vals AS (
       |  SELECT product, ask_price_1 - bid_price_1 AS v FROM bbo
       |  WHERE ask_price_1 IS NOT NULL AND bid_price_1 IS NOT NULL
       |), cnts AS (
       |  SELECT product, v, count(*) AS c FROM vals GROUP BY product, v
       |), cum AS (
       |  SELECT product, v, c,
       |    sum(c) OVER (PARTITION BY product ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(c) OVER (PARTITION BY product) AS n
       |  FROM cnts
       |)
       |SELECT product, q_permille,
       |  min(CASE WHEN cum >= (q_permille * n + 999) // 1000 THEN v END) AS value
       |FROM cum, (SELECT unnest([${SPREAD_QUANTILES.map(p => s"${p}::BIGINT").mkString(", ")}]) AS q_permille)
       |GROUP BY product, q_permille""".stripMargin

  def ofiOracle: String =
    s"""$bboCte1, lagged AS (
       |  SELECT product, seq,
       |    bid_price_1 AS b, bid_qty_1 AS qb,
       |    ask_price_1 AS a, ask_qty_1 AS qa,
       |    lag(bid_price_1) OVER w AS pb, lag(bid_qty_1) OVER w AS pqb,
       |    lag(ask_price_1) OVER w AS pa, lag(ask_qty_1) OVER w AS pqa
       |  FROM bbo WINDOW w AS (PARTITION BY product ORDER BY seq)
       |), flows AS (
       |  SELECT product, seq,
       |    CASE WHEN b IS NOT NULL AND pb IS NOT NULL THEN
       |      (CASE WHEN b >= pb THEN qb ELSE 0 END)
       |        - (CASE WHEN b <= pb THEN pqb ELSE 0 END)
       |    ELSE 0 END
       |    + CASE WHEN a IS NOT NULL AND pa IS NOT NULL THEN
       |      -(CASE WHEN a <= pa THEN qa ELSE 0 END)
       |        + (CASE WHEN a >= pa THEN pqa ELSE 0 END)
       |    ELSE 0 END AS ofi
       |  FROM lagged
       |)
       |SELECT product, seq, CAST(ofi AS BIGINT) AS ofi,
       |  CAST(sum(ofi) OVER (PARTITION BY product ORDER BY seq
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_ofi
       |FROM flows""".stripMargin
}
