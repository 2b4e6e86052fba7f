package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The host-surface operators the reference composes with (SURVEY.md §2.7):
  * projection/rename, predicates, when/isin, group-by aggregation, equi-join
  * (broadcast for small dims), sort/limit, window functions, float→int price
  * scaling — each exercised as an oracle-checked query on the TPC-H-ish
  * tables.
  *
  * Float discipline — two exact recipes, both order-insensitive (Spark
  * shuffles make double-sum ordering nondeterministic):
  * (1) DECIMAL(18,2) casts before arithmetic (rollup/pivot/brand/q6 —
  * the declarative form); (2) on the hot aggregates (q1, revenue), the
  * reference's own float→int scaling recipe (README.md:145-158): LONG
  * integer-cents partial sums per partition merged through one
  * DECIMAL(38,0) sum — all per-row work in 64-bit arithmetic (~2.3×
  * faster than DECIMAL accumulation), grand totals still
  * overflow-proof at any scale. Results cast back to DOUBLE at the end.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q1_pricing_summary", pricingSummary, Some(pricingSummarySql), bench = true),
    GraftQuery("q_revenue_by_nation", revenueByNation, Some(revenueByNationSql), bench = true),
    GraftQuery("q_topk_orders", topkOrders, Some(topkOrdersSql)),
    GraftQuery("q_window_running", windowRunning, Some(windowRunningSql), bench = true),
    GraftQuery("q_normalize_messages", normalizeMessages, Some(normalizeMessagesSql)),
    GraftQuery("q_orders_per_status", ordersPerStatus, Some(ordersPerStatusSql)),
    GraftQuery("q_semi_anti_join", semiAntiJoin, Some(semiAntiJoinSql)),
    GraftQuery("q_set_ops", setOps, Some(setOpsSql), bench = true),
    GraftQuery("q6_forecast_revenue", forecastRevenue, Some(forecastRevenueSql)),
    GraftQuery("q_asof_join", asofJoin, Some(asofJoinSql), bench = true),
    GraftQuery("q_asof_join_forward", asofJoinForward, Some(asofJoinForwardSql)),
    GraftQuery("q_asof_join_nearest", asofJoinNearest, Some(asofJoinNearestSql)),
    GraftQuery("q_asof_join_tolerance", asofJoinTolerance, Some(asofJoinToleranceSql)),
    GraftQuery("q_asof_join_nearest_tol", asofJoinNearestTol, Some(asofJoinNearestTolSql)),
    GraftQuery("q_brand_volume_by_region", brandVolumeByRegion, Some(brandVolumeByRegionSql)),
    GraftQuery("q_rollup_orders", rollupOrders, Some(rollupOrdersSql)),
    GraftQuery("q_pivot_orders", pivotOrders, Some(pivotOrdersSql)),
    GraftQuery("q_range_join", rangeJoin, Some(rangeJoinSql)),
    GraftQuery("q_sessionize", sessionize, Some(sessionizeSql)),
    GraftQuery("q_zorder_layout", zorderLayout, Some(zorderLayoutSql), bench = true),
    // mergeable quantile sketch (the quantile sibling of HLL): bounded
    // log2+linear bucket relation, counts sum-mergeable, bit-exact
    // across engines; value_lb under-reports by < 2^-5 relative
    GraftQuery("q_quantile_sketch", quantileSketchQ, Some(quantileSketchSql)),
    // the sketch through the PERSISTED lifecycle (8th artifact): even
    // orderkeys build, odd fold in via sum-merge append, quantiles read
    // ONLY the stored epoch — counts are associative, so output ≡ the
    // one-shot sketch and the query shares its oracle
    GraftQuery("q_quantile_stored", quantileStoredQ, Some(quantileSketchSql)),
    // salted equi-join: the hot side spread over 8 synthetic sub-keys,
    // the dim replicated per salt — result provably identical to the
    // plain join (the oracle doesn't even mention the salt)
    GraftQuery("q_salted_join", saltedJoinQ, Some(saltedJoinSql)),
    // same aggregate through the FULL-outer salted variant with
    // autoSalts sizing the spread from the bounded hot-key probe —
    // the round-13 completions driven through the oracle gate (a
    // planted dim-only key proves the preserved-right leg)
    GraftQuery("q_salted_join_auto", saltedJoinAutoQ, Some(saltedJoinAutoSql)),
  )

  private val Z_BITS = 4 // 16x16 cell grid, zcell in [0, 256)

  private val QS_PERMILLE = Seq(500, 900, 990)
  private val QS_BITS = 5

  /** Mergeable-sketch price quantiles per return flag: integer-cents
    * prices (spanning the exact region AND several log2 regions)
    * through [[graft.pipeline.StatsOps.sketchQuantilesByGroup]] — the
    * bounded-relation path a 100 TB monitor takes instead of the
    * full-sort exact operator; deterministic bucket arithmetic, so the
    * oracle matches bit-for-bit (QuantileSketchSpec measures the
    * < 2^-5 relative error against the exact quantiles). */
  def quantileSketchQ(spark: SparkSession, sfDir: String): DataFrame =
    graft.pipeline.StatsOps.sketchQuantilesByGroup(
      Tables.read(spark, sfDir, "lineitem"),
      Seq("l_returnflag"), cents(col("l_extendedprice")),
      QS_PERMILLE, QS_BITS)

  def quantileSketchSql: String =
    graft.pipeline.StatsOps.sketchQuantilesByGroupSql(
      "SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem",
      "l_returnflag", QS_PERMILLE, QS_BITS)

  /** [[quantileSketchQ]] through the persisted-index lifecycle: the
    * even-orderkey half builds the artifact (rebuilt fresh each run —
    * never cached across corpus regenerations), the odd half folds in
    * via [[graft.pipeline.StatsOps.appendQuantileIndex]] (a bounded
    * sum-merge), and the quantiles read only the stored epoch. Bucket
    * counts sum associatively, so this ≡ the one-shot sketch — which
    * is why it shares q_quantile_sketch's oracle. */
  def quantileStoredQ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    // fresh per-invocation directory: a deterministic path keyed on sfDir
    // would let two concurrent runs (or a hashCode collision) race each
    // other's write/swap and read a mixed-generation index
    val dir = graft.sources.TableSources.scratchDir("graft_qs_idx_")
    graft.pipeline.StatsOps.writeQuantileIndex(
      li.filter(col("l_orderkey") % 2 === 0), Seq("l_returnflag"),
      cents(col("l_extendedprice")), dir, QS_BITS)
    graft.pipeline.StatsOps.appendQuantileIndex(spark, dir,
      li.filter(col("l_orderkey") % 2 === 1), cents(col("l_extendedprice")))
    graft.pipeline.StatsOps.quantilesFromStoredSketch(spark, dir, QS_PERMILLE)
  }

  /** Skew-spread join: lineitem's 3-value return flag is the classic
    * hot key (a third of the table per key — a plain shuffle join runs
    * three giant tasks); [[graft.operators.SaltedJoin]] spreads each
    * flag over 8 sub-keys and replicates the 3-row dim per salt. The
    * aggregate output — and the oracle — are salt-free: salting is
    * correctness-neutral by construction, which is exactly what the
    * green row proves (SaltedJoinSpec measures the balance half). */
  def saltedJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
    val dim = li.select(col("l_returnflag")).distinct()
      .select(col("l_returnflag"),
        concat(lit("flag_"), col("l_returnflag")).as("label"))
    graft.operators.SaltedJoin.saltedJoin(li, dim, "l_returnflag", salts = 8)
      .groupBy(col("l_returnflag"), col("label"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
  }

  def saltedJoinSql: String =
    """SELECT l_returnflag, 'flag_' || l_returnflag AS label,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** [[saltedJoinQ]] through the FULL-outer variant with auto-sized
    * salts: the dim side carries a planted key with no fact rows, which
    * must survive the join exactly once (the per-salt-replica failure
    * mode the anti-join null-extension leg exists to prevent), and the
    * salt count comes from [[graft.operators.SaltedJoin.autoSalts]]'s
    * bounded probe instead of a hand pick. */
  def saltedJoinAutoQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
    val dim = li.select(col("l_returnflag")).distinct()
      .select(col("l_returnflag"),
        concat(lit("flag_"), col("l_returnflag")).as("label"))
      .unionByName(Seq(("Z", "flag_Z")).toDF("l_returnflag", "label"))
    val salts = graft.operators.SaltedJoin.autoSalts(
      li, "l_returnflag", targetPerSalt = 1000L, maxSalts = 16)
    graft.operators.SaltedJoin.saltedJoin(li, dim, "l_returnflag", salts,
        joinType = "full_outer")
      .groupBy(col("l_returnflag"), col("label"))
      .agg(count(col("qty")).as("n"), sum(col("qty")).as("sum_qty"))
  }

  def saltedJoinAutoSql: String =
    """WITH dim AS (
      |  SELECT DISTINCT l_returnflag, 'flag_' || l_returnflag AS label
      |  FROM lineitem
      |  UNION ALL SELECT 'Z', 'flag_Z'
      |)
      |SELECT d.l_returnflag, d.label,
      |  count(l.l_quantity) AS n,
      |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM dim d LEFT JOIN lineitem l ON l.l_returnflag = d.l_returnflag
      |GROUP BY 1, 2""".stripMargin

  /** Z-order (Morton) layout cells over lineitem's two join keys —
    * the clustered-write side of multi-dimensional pruning (see
    * pipeline/LayoutOps.scala for the 100 TB story; LayoutSpec proves
    * the probe side partition-prunes). Map-only after one 4-scalar
    * min/max snapshot; exact integer bucket + bit-interleave math, so
    * the oracle reproduces every cell id bit-for-bit. */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame =
    graft.pipeline.LayoutOps.zorderLayout(
      Tables.read(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey", Z_BITS)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("cell_a"), col("cell_b"), col("zcell"))

  def zorderLayoutSql: String = {
    val cells = 1 << Z_BITS
    s"""WITH mm AS (
       |  SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
       |         min(l_suppkey) AS bmin, max(l_suppkey) AS bmax
       |  FROM lineitem
       |), bucketed AS (
       |  SELECT l_orderkey, l_linenumber,
       |    ((l_partkey - amin) * $cells) // (amax - amin + 1) AS cell_a,
       |    ((l_suppkey - bmin) * $cells) // (bmax - bmin + 1) AS cell_b
       |  FROM lineitem, mm
       |)
       |SELECT l_orderkey, l_linenumber, cell_a, cell_b,
       |  ${graft.pipeline.LayoutOps.zValueSql("cell_a", "cell_b", Z_BITS)} AS zcell
       |FROM bucketed""".stripMargin
  }

  /** Hierarchical totals via ROLLUP (the grouping-sets family). */
  def rollupOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("total"))

  def rollupOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Pivot (long → wide): order counts per priority with one column per
    * status. Values listed EXPLICITLY — pivot without a value list runs
    * an extra distinct job to discover them and makes the output schema
    * data-dependent (a plan-stability hazard at scale). */
  def pivotOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))

  def pivotOrdersSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q6-shaped: pure filter + single aggregate (range predicates on
    * date, discount, quantity — all pushed to the scan). */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
          .cast(DecimalType(30, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  def forecastRevenueSql: String =
    """SELECT
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Star join across part, supplier, nation, region: brand volume per
    * supplier region (covers every dimension table). */
  def brandVolumeByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    val part = Tables.read(spark, sfDir, "part")
    val supp = Tables.read(spark, sfDir, "supplier")
    val nat = Tables.read(spark, sfDir, "nation")
    val reg = Tables.read(spark, sfDir, "region")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("p_brand"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("volume"),
        count(lit(1)).as("n_items"))
  }

  def brandVolumeByRegionSql: String =
    """SELECT r_name, p_brand,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS volume,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, p_brand""".stripMargin

  /** EXISTS / NOT EXISTS via left_semi / left_anti joins: customers with
    * and without urgent orders. */
  def semiAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
    val urgent = Tables.read(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val withU = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(true).as("has_urgent"))
    val withoutU = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(false).as("has_urgent"))
    withU.unionAll(withoutU)
  }

  def semiAntiJoinSql: String =
    """SELECT c_custkey, TRUE AS has_urgent FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT c_custkey, FALSE AS has_urgent FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  /** Set operations over derived key sets: customers who ordered vs the
    * full customer set (union/intersect/except counts).
    *
    * One fully-lazy plan: tag each side, union, single shuffle on the key
    * with presence flags (max combines map-side), then one global
    * aggregate derives all three counts — instead of three separate
    * distinct/intersect/except jobs (and instead of running them eagerly
    * at plan construction, which made the returned frame a driver-side
    * literal). */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), lit(1).as("src"))
    val ordered = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"), lit(2).as("src"))
    all.unionAll(ordered)
      .groupBy(col("k"))
      .agg(max(col("src") === 1).as("in_a"), max(col("src") === 2).as("in_b"))
      .agg(
        count(lit(1)).as("n_union"),
        count(when(col("in_a") && col("in_b"), 1)).as("n_intersect"),
        count(when(col("in_a") && !col("in_b"), 1)).as("n_except"))
  }

  def setOpsSql: String =
    """SELECT
      |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
      |                         UNION SELECT o_custkey FROM orders)) AS n_union,
      |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
      |                         INTERSECT SELECT o_custkey FROM orders)) AS n_intersect,
      |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
      |                         EXCEPT SELECT o_custkey FROM orders)) AS n_except""".stripMargin

  /** TPC-H Q1-shaped pricing summary: filter + group-by agg with exact
    * decimal sums. */
  /** Integer-cents column: floor(x·100 + 0.5) — the reference's own
    * float→int price-scaling recipe (reference README.md:145-158),
    * bit-identical across engines (IEEE floor both sides). */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")

  /** Exact integer sum that survives any scale: LONG partial sums per
    * input partition (all the per-row work is 64-bit arithmetic — ~2.3×
    * faster than DECIMAL accumulation, measured), merged with a
    * DECIMAL(38,0) sum over the tiny (group × partition) partial
    * relation so the grand total cannot overflow. The long partial is
    * safe while a single partition contributes < 2^63 to one group —
    * ~9e9 rows at max cents product; a partition that size is already
    * pathological, and ANSI mode fails loudly rather than wrapping if
    * one ever appears. The partial agg combines map-side, so the
    * shuffle carries one row per (group, input partition). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      // nondeterministic exprs are only allowed in Project — stage the
      // partition id as a column before grouping on it
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("__pid"))
      .agg(
        sum(cents(col("l_quantity"))).as("__qty"),
        sum(cents(col("l_extendedprice"))).as("__base"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("__disc_price"),
        sum(cents(col("l_discount"))).as("__disc"),
        count(lit(1)).as("__n"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("__qty").cast(DecimalType(38, 0))).cast("double") / 100.0).as("sum_qty"),
        (sum(col("__base").cast(DecimalType(38, 0))).cast("double") / 100.0).as("sum_base_price"),
        (sum(col("__disc_price").cast(DecimalType(38, 0))).cast("double") / 10000.0).as("sum_disc_price"),
        (sum(col("__qty").cast(DecimalType(38, 0))).cast("double") / 100.0 / sum(col("__n"))).as("avg_qty"),
        (sum(col("__disc").cast(DecimalType(38, 0))).cast("double") / 100.0 / sum(col("__n"))).as("avg_disc"),
        sum(col("__n")).as("count_order"))
  }

  /** The oracle needs no partition split: the partial/merge structure
    * only changes WHERE the exact integer total is accumulated, not its
    * value, so DuckDB sums the cents directly (sum(BIGINT) is HUGEINT —
    * exact). */
  def pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
      |  CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue per nation: 4-way equi-join with broadcast dims + agg. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
    val ord = Tables.read(spark, sfDir, "orders")
    val li = Tables.read(spark, sfDir, "lineitem")
    val nat = Tables.read(spark, sfDir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      // same long-partial / decimal-merge recipe as pricingSummary
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("n_name"), col("__pid"))
      .agg(
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("__rev"),
        count(lit(1)).as("__n"))
      .groupBy(col("n_name"))
      .agg(
        (sum(col("__rev").cast(DecimalType(38, 0))).cast("double") / 10000.0).as("revenue"),
        sum(col("__n")).as("n_items"))
  }

  def revenueByNationSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Top-K with deterministic tie-break. */
  def topkOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  def topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** Analytic windows over the events stream: running decimal sum and
    * row_number per user, ordered by event_id. */
  def windowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.read(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        // cast: Spark row_number is INT, DuckDB's is BIGINT — normalized
        // so the local type-parity gate holds with zero exceptions
        row_number().over(w).cast("long").as("rn"),
        sum(col("value").cast(dec)).over(w).cast("double").as("running_value"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
  }

  def windowRunningSql: String =
    """SELECT event_id, user_id,
      |  row_number() OVER w AS rn,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
      |  lag(event_type, 1) OVER w AS prev_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin

  /** The README normalization recipe (reference README.md:133-178): string
    * side → boolean, message-type → signed qty via when/isin, float price →
    * scaled long (×100, round, cast). */
  def normalizeMessages(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "events")
      .select(
        col("event_id"),
        col("event_type").isin("view", "click", "signup").as("is_bid"),
        round(col("value") * 100).cast("long").as("price_scaled"),
        when(col("event_type").isin("error", "purchase"),
          -(col("event_id") % 50 + 1)).otherwise(col("event_id") % 50 + 1)
          .as("qty_signed"))

  def normalizeMessagesSql: String =
    """SELECT event_id,
      |  event_type IN ('view','click','signup') AS is_bid,
      |  CAST(round(value * 100) AS BIGINT) AS price_scaled,
      |  CASE WHEN event_type IN ('error','purchase')
      |       THEN -(event_id % 50 + 1) ELSE event_id % 50 + 1 END AS qty_signed
      |FROM events""".stripMargin

  /** Distinct-ish aggregation with having-style filter. */
  def ordersPerStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .filter(col("n") > 0)

  def ordersPerStatusSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  count(DISTINCT o_custkey) AS n_custs
      |FROM orders GROUP BY o_orderstatus, o_orderpriority HAVING count(*) > 0""".stripMargin

  /** As-of join: each derived trade matched to the prevailing quote
    * (latest quote at or before the trade, same user) — checked against
    * DuckDB's native ASOF LEFT JOIN. */
  /** Shared fixture for every as-of query: hash-derived quote prices on
    * even event ids, trade values on odd ids. Returns (trades, quotes);
    * `asofCtes` is the oracle-side statement of the same two relations. */
  private def asofSides(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val ev = Tables.read(spark, sfDir, "events")
    val quotes = ev.filter(col("event_id") % 2 === 0).select(
      col("user_id"),
      col("event_id").as("t"),
      (lit(50) + (col("event_id") * lit(2654435761L)) % 45).as("quote_px"))
    val trades = ev.filter(col("event_id") % 2 === 1).select(
      col("user_id"),
      col("event_id").as("t"),
      (lit(1) + (col("event_id") * lit(48271L)) % 100).as("trade_val"))
    (trades, quotes)
  }

  private val asofCtes: String =
    """WITH quotes AS (
      |  SELECT user_id, event_id AS t,
      |         50 + (event_id * 2654435761) % 45 AS quote_px
      |  FROM events WHERE event_id % 2 = 0
      |), trades AS (
      |  SELECT user_id, event_id AS t,
      |         1 + (event_id * 48271) % 100 AS trade_val
      |  FROM events WHERE event_id % 2 = 1
      |)""".stripMargin

  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (trades, quotes) = asofSides(spark, sfDir)
    graft.operators.AsOfJoin.joinAsOfBackward(
      trades, quotes, timeCol = "t", keys = Seq("user_id"),
      valueCols = Seq("quote_px"))
  }

  def asofJoinSql: String =
    s"""$asofCtes
      |SELECT t.user_id, t.t, t.trade_val, q.quote_px, q.t AS asof_t
      |FROM trades t ASOF LEFT JOIN quotes q
      |  ON t.user_id = q.user_id AND t.t >= q.t""".stripMargin

  private val ASOF_TOL = 7L

  /** Backward as-of with a staleness tolerance: matches older than 7
    * ticks are nulled out (the match columns, not the left row). */
  def asofJoinTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val (trades, quotes) = asofSides(spark, sfDir)
    graft.operators.AsOfJoin.joinAsOfBackward(
      trades, quotes, timeCol = "t", keys = Seq("user_id"),
      valueCols = Seq("quote_px"), tolerance = Some(ASOF_TOL))
  }

  /** DuckDB ASOF has no tolerance kwarg; the oracle nulls stale matches
    * after the join — identical semantics (left rows kept 1:1). */
  def asofJoinToleranceSql: String =
    s"""$asofCtes
       |SELECT t.user_id, t.t, t.trade_val,
       |  CASE WHEN t.t - q.t <= $ASOF_TOL THEN q.quote_px END AS quote_px,
       |  CASE WHEN t.t - q.t <= $ASOF_TOL THEN q.t END AS asof_t
       |FROM trades t ASOF LEFT JOIN quotes q
       |  ON t.user_id = q.user_id AND t.t >= q.t""".stripMargin

  /** Range (interval) join via binning: every trade matched to ALL
    * quotes whose validity interval [s, s+17) contains the trade time —
    * the binned equi-join plan instead of Spark's nested-loop inequality
    * join; checked against DuckDB's plain range predicate. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.read(spark, sfDir, "events")
    val quotes = ev.filter(col("event_id") % 2 === 0).select(
      col("user_id"),
      col("event_id").as("s"),
      (col("event_id") + 17).as("e"),
      (lit(50) + (col("event_id") * lit(2654435761L)) % 45).as("quote_px"))
    val trades = ev.filter(col("event_id") % 2 === 1).select(
      col("user_id"),
      col("event_id").as("t"),
      (lit(1) + (col("event_id") * lit(48271L)) % 100).as("trade_val"))
    graft.operators.RangeJoin.joinPointInInterval(
        trades, quotes, timeCol = "t", startCol = "s", endCol = "e",
        keys = Seq("user_id"), binWidth = 16L)
      .select(col("user_id"), col("t"), col("trade_val"),
        col("s"), col("e"), col("quote_px"))
  }

  def rangeJoinSql: String =
    """WITH quotes AS (
      |  SELECT user_id, event_id AS s, event_id + 17 AS e,
      |         50 + (event_id * 2654435761) % 45 AS quote_px
      |  FROM events WHERE event_id % 2 = 0
      |), trades AS (
      |  SELECT user_id, event_id AS t,
      |         1 + (event_id * 48271) % 100 AS trade_val
      |  FROM events WHERE event_id % 2 = 1
      |)
      |SELECT t.user_id, t.t, t.trade_val, q.s, q.e, q.quote_px
      |FROM trades t JOIN quotes q
      |  ON t.user_id = q.user_id AND t.t >= q.s AND t.t < q.e""".stripMargin

  /** Gap-based sessionization of the event log (gap > 40 starts a new
    * session per user), rolled up to per-session stats. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sessionize.sessionStats(
      Tables.read(spark, sfDir, "events")
        .select(col("user_id"), col("event_id").as("t")),
      timeCol = "t", keys = Seq("user_id"), maxGap = 40L)

  def sessionizeSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id AS t FROM events
      |), m AS (
      |  SELECT user_id, t,
      |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 40
      |         THEN t END AS marker
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t)
      |), s AS (
      |  SELECT user_id, t,
      |    last_value(marker IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS session_start
      |  FROM m
      |)
      |SELECT user_id, session_start, count(*) AS n_events,
      |  max(t) - min(t) AS span
      |FROM s GROUP BY user_id, session_start""".stripMargin

  /** Forward as-of: each trade matched to the NEXT quote at or after it. */
  def asofJoinForward(spark: SparkSession, sfDir: String): DataFrame = {
    val (trades, quotes) = asofSides(spark, sfDir)
    graft.operators.AsOfJoin.joinAsOfForward(
      trades, quotes, timeCol = "t", keys = Seq("user_id"),
      valueCols = Seq("quote_px"))
  }

  /** Nearest as-of: minimize |quote time − trade time|, ties backward.
    * Oracle formulated independently (arg_min over a composite integer
    * key: 2·distance + forward-bit) rather than mirroring the two-frame
    * window implementation. */
  def asofJoinNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val (trades, quotes) = asofSides(spark, sfDir)
    graft.operators.AsOfJoin.joinAsOfNearest(
      trades, quotes, timeCol = "t", keys = Seq("user_id"),
      valueCols = Seq("quote_px"))
  }

  def asofJoinNearestSql: String =
    s"""$asofCtes
      |SELECT t.user_id, t.t, t.trade_val,
      |  arg_min(q.quote_px,
      |    2 * abs(q.t - t.t) + (CASE WHEN q.t <= t.t THEN 0 ELSE 1 END)) AS quote_px,
      |  arg_min(q.t,
      |    2 * abs(q.t - t.t) + (CASE WHEN q.t <= t.t THEN 0 ELSE 1 END)) AS asof_t
      |FROM trades t LEFT JOIN quotes q ON t.user_id = q.user_id
      |GROUP BY t.user_id, t.t, t.trade_val""".stripMargin

  /** Nearest-strategy as-of with a tolerance: the match is the nearest
    * among IN-TOLERANCE candidates (merge_asof convention — candidates
    * are gated by tolerance BEFORE the nearest pick, not nulled after). */
  def asofJoinNearestTol(spark: SparkSession, sfDir: String): DataFrame = {
    val (trades, quotes) = asofSides(spark, sfDir)
    graft.operators.AsOfJoin.joinAsOfNearest(
      trades, quotes, timeCol = "t", keys = Seq("user_id"),
      valueCols = Seq("quote_px"), tolerance = Some(ASOF_TOL))
  }

  /** Oracle: arg_min over candidates FILTERed to the tolerance window —
    * the independent statement of "nearest among in-tolerance". */
  def asofJoinNearestTolSql: String =
    s"""$asofCtes
       |SELECT t.user_id, t.t, t.trade_val,
       |  arg_min(q.quote_px,
       |    2 * abs(q.t - t.t) + (CASE WHEN q.t <= t.t THEN 0 ELSE 1 END))
       |    FILTER (WHERE abs(q.t - t.t) <= $ASOF_TOL) AS quote_px,
       |  arg_min(q.t,
       |    2 * abs(q.t - t.t) + (CASE WHEN q.t <= t.t THEN 0 ELSE 1 END))
       |    FILTER (WHERE abs(q.t - t.t) <= $ASOF_TOL) AS asof_t
       |FROM trades t LEFT JOIN quotes q ON t.user_id = q.user_id
       |GROUP BY t.user_id, t.t, t.trade_val""".stripMargin

  def asofJoinForwardSql: String =
    s"""$asofCtes
      |SELECT t.user_id, t.t, t.trade_val, q.quote_px, q.t AS asof_t
      |FROM trades t ASOF LEFT JOIN quotes q
      |  ON t.user_id = q.user_id AND t.t <= q.t""".stripMargin
}
