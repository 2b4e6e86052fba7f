package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Downstream analytics over a replayed top-of-book frame — what a user
  * of the reference engine computes FROM its output (the reference stops
  * at top-N levels; polars_order_book/README.md "calculate top-of-book
  * prices"). All arithmetic is int64 fixed-point so the DuckDB oracles
  * match bit-for-bit: scaled integer floor-division (`div`) instead of
  * floating division, and no transcendentals (cross-engine libm results
  * are not hash-stable).
  *
  * Inputs are any frame with the BBO n=1 shape (`bid_price_1`,
  * `bid_qty_1`, `ask_price_1`, `ask_qty_1` + key/order columns); an
  * empty book side is NULL there (the replay's own convention), and
  * NULL propagates through the arithmetic identically in both engines,
  * so one-sided quotes yield NULL analytics rather than silent zeros.
  *
  * Scale shape: [[microprice]] and [[orderFlowImbalance]] are map-only
  * over the replay output (OFI adds one already-partitioned window);
  * [[timeWeightedSpread]] is one partial-aggregated groupBy per product.
  * Nothing here re-shuffles the corpus-sized replay beyond the
  * product-partitioned exchanges the replay itself established.
  */
object BookAnalytics {

  /** Per-event microstructure signals from the top of book:
    *
    *  - `spread`              = ask − bid (price ticks)
    *  - `imbalance_permille`  = 1000·qb ÷ (qb+qa), floor
    *  - `microprice_e6`       = 10^6·(bid·qa + ask·qb) ÷ (qb+qa), floor —
    *    the qty-weighted mid of Gatheral/Stoikov ("micro-price"), the
    *    short-horizon fair-value estimate market makers quote around.
    *
    * Map-only: no join, no shuffle, NULL-propagating on one-sided books.
    */
  def microprice(bbo: DataFrame,
                 keyCols: Seq[String] = Seq("product", "seq")): DataFrame = {
    val qb = col("bid_qty_1"); val qa = col("ask_qty_1")
    val pb = col("bid_price_1"); val pa = col("ask_price_1")
    val denom = qb + qa
    bbo.select(keyCols.map(col) ++ Seq(
      (pa - pb).as("spread"),
      call_function("div", qb * 1000L, denom).as("imbalance_permille"),
      call_function("div", (pb * qa + pa * qb) * 1000000L, denom)
        .as("microprice_e6")): _*)
  }

  /** Time-weighted average spread per product, weighting each two-sided
    * quote by its lifetime in sequence ticks (the replay's `seq` is the
    * time axis; a real feed would pass an event-time column instead).
    * The last event per product has no successor and carries no weight —
    * standard TWA bookkeeping. Products that never quote two-sided emit
    * NULL (0-duration denominators stay NULL through `div`).
    *
    * One product-partitioned lead() (the replay's own partitioning) and
    * one partial-aggregated groupBy — no corpus-sized shuffle beyond the
    * per-product exchange that already exists.
    */
  def timeWeightedSpread(bbo: DataFrame,
                         productCol: String = "product",
                         seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(productCol)).orderBy(col(seqCol))
    val spread = col("ask_price_1") - col("bid_price_1")
    val dt = lead(col(seqCol), 1).over(w) - col(seqCol)
    val rows = bbo.select(col(productCol), spread.as("__sp"), dt.as("__dt"))
    rows.groupBy(col(productCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__sp").isNotNull && col("__dt").isNotNull, lit(1L))
          .otherwise(lit(0L))).as("n_quoted"),
        sum(when(col("__sp").isNotNull, col("__dt"))).as("quoted_ticks"),
        sum(when(col("__sp").isNotNull, col("__sp") * col("__dt")))
          .as("__area"))
      .select(col(productCol), col("n_events"), col("n_quoted"),
        col("quoted_ticks"),
        call_function("div", col("__area") * 1000L, col("quoted_ticks"))
          .as("twa_spread_permille"))
  }

  /** Depth imbalance over the top n levels: total resting qty per side
    * and 1000·bid_depth ÷ (bid_depth+ask_depth), floor — the multi-level
    * generalization of [[microprice]]'s best-level imbalance (absent
    * levels count 0; an entirely empty book yields NULL imbalance via
    * the explicit guard, not a divide-by-zero). Map-only. */
  def depthImbalance(bbo: DataFrame, n: Int,
                     keyCols: Seq[String] = Seq("product", "seq")): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val bid = (1 to n).map(i => coalesce(col(s"bid_qty_$i"), lit(0L))).reduce(_ + _)
    val ask = (1 to n).map(i => coalesce(col(s"ask_qty_$i"), lit(0L))).reduce(_ + _)
    bbo.select(keyCols.map(col) ++ Seq(
      bid.as("bid_depth"), ask.as("ask_depth"),
      when(bid + ask > 0,
        call_function("div", bid * 1000L, bid + ask))
        .as("depth_imbalance_permille")): _*)
  }

  /** Per-product realized variance of the MID price — the standard
    * volatility estimate Σ(Δmid)² over consecutive two-sided quotes,
    * kept int64-exact by working in DOUBLED mids (2·mid = bid + ask is
    * an integer; the output is 4·Σ(Δmid)², named accordingly — the
    * consumer divides by 4 once, instead of every row losing half-tick
    * precision). One-sided quotes break the return chain: a Δ is
    * counted only between CONSECUTIVE two-sided events (lag over the
    * two-sided sub-stream). One product-partitioned window + one
    * partial-aggregated groupBy. */
  def realizedVariance(bbo: DataFrame,
                       productCol: String = "product",
                       seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(productCol)).orderBy(col(seqCol))
    val mid2 = col("bid_price_1") + col("ask_price_1")
    val quoted = bbo.filter(col("bid_price_1").isNotNull &&
        col("ask_price_1").isNotNull)
      .select(col(productCol), col(seqCol), mid2.as("__m2"))
      .withColumn("__d", col("__m2") - lag(col("__m2"), 1).over(w))
    quoted.groupBy(col(productCol))
      .agg(count(lit(1)).as("n_quotes"),
        sum(when(col("__d").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_moves"),
        coalesce(sum(col("__d") * col("__d")), lit(0L)).as("rv_x4"))
  }

  /** Best-level order-flow imbalance (Cont, Kukanov & Stoikov 2014,
    * "The price impact of order book events", J. Financial Econometrics
    * 12(1) — the e_n of eq. (10)):
    *
    *   e_n =  I{b_n ≥ b_{n−1}}·qb_n  −  I{b_n ≤ b_{n−1}}·qb_{n−1}
    *        − I{a_n ≤ a_{n−1}}·qa_n  +  I{a_n ≥ a_{n−1}}·qa_{n−1}
    *
    * positive when buying pressure builds (bid improves or grows, ask
    * lifts), negative when it drains. A side contributes 0 while it or
    * its predecessor is one-sided NULL (no flow is observable across an
    * empty book), and the first event per product has no predecessor —
    * both engines agree because the CASE guards are explicit, never
    * NULL-arithmetic accidents. `cum_ofi` is the running sum — the
    * signal actually regressed against price moves in the paper.
    *
    * One product-partitioned window (lag + running sum) — the exchange
    * the replay already established; no join, no extra shuffle.
    */
  def orderFlowImbalance(bbo: DataFrame,
                         productCol: String = "product",
                         seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(productCol)).orderBy(col(seqCol))
    val b = col("bid_price_1"); val qb = col("bid_qty_1")
    val a = col("ask_price_1"); val qa = col("ask_qty_1")
    val pb = lag(b, 1).over(w); val pqb = lag(qb, 1).over(w)
    val pa = lag(a, 1).over(w); val pqa = lag(qa, 1).over(w)
    val bidFlow = when(b.isNotNull && pb.isNotNull,
      when(b >= pb, qb).otherwise(lit(0L)) -
        when(b <= pb, pqb).otherwise(lit(0L))).otherwise(lit(0L))
    val askFlow = when(a.isNotNull && pa.isNotNull,
      when(a <= pa, qa).otherwise(lit(0L)) * -1L +
        when(a >= pa, pqa).otherwise(lit(0L))).otherwise(lit(0L))
    val wRun = Window.partitionBy(col(productCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bbo.select(col(productCol), col(seqCol),
        (bidFlow + askFlow).as("ofi"))
      .withColumn("cum_ofi", sum(col("ofi")).over(wRun))
  }
}
