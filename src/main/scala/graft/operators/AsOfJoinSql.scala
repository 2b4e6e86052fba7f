package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface embodiment of [[AsOfJoin]]: generates plain Spark SQL
  * (union-tag + running window — the exact plan the Scala API builds)
  * over two registered views, so `spark.sql(...)` users get as-of joins
  * with the same one-shuffle scale shape and identical semantics:
  * backward / forward / nearest strategies, optional tolerance,
  * null-key and null-time behavior.
  *
  * The generator introspects the right view's schema (for the typed
  * null struct on the left branch of the union) — a planning-time
  * lookup, no data access.
  */
object AsOfJoinSql {

  /** Backward as-of join SQL: latest right row with rightTime <= leftTime. */
  def backwardSql(spark: SparkSession, leftView: String, rightView: String,
                  timeCol: String, keys: Seq[String], valueCols: Seq[String],
                  tolerance: Option[Long] = None): String =
    directionalSql(spark, leftView, rightView, timeCol, keys, valueCols,
      tolerance, forward = false)

  /** Forward as-of join SQL: earliest right row with rightTime >= leftTime. */
  def forwardSql(spark: SparkSession, leftView: String, rightView: String,
                 timeCol: String, keys: Seq[String], valueCols: Seq[String],
                 tolerance: Option[Long] = None): String =
    directionalSql(spark, leftView, rightView, timeCol, keys, valueCols,
      tolerance, forward = true)

  /** Shared union CTE: left rows tagged 1 with a typed-null payload,
    * right rows tagged 0 with (time, values) packed into one struct;
    * null-keyed / null-timed right rows filtered (they can match
    * nothing). Returns (unionSql, leftCols). */
  private def unionSql(spark: SparkSession, leftView: String, rightView: String,
                       timeCol: String, keys: Seq[String],
                       valueCols: Seq[String]): (String, Seq[String]) = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val left = spark.table(leftView)
    val right = spark.table(rightView)
    val reserved = valueCols.toSet ++
      Set(s"asof_$timeCol", "__rpack", "__tag", "__asof", "__back", "__fwd")
    val clash = left.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"left already has reserved/output columns: $clash")
    val leftCols = left.columns.toSeq
    val packed = struct(
      (col(timeCol).cast("long").as("__rt") +: valueCols.map(c => col(c).as(c))): _*)
    val packType = right.select(packed.as("__rpack")).schema("__rpack").dataType.sql
    val packSql = (s"'__rt', CAST($timeCol AS BIGINT)" +:
      valueCols.map(c => s"'$c', $c")).mkString("named_struct(", ", ", ")")
    val rightSelect = leftCols.map { c =>
      if (keys.contains(c) || c == timeCol) c
      else s"CAST(NULL AS ${left.schema(c).dataType.sql}) AS $c"
    }
    val notNull = (keys :+ timeCol).map(k => s"$k IS NOT NULL").mkString(" AND ")
    val u =
      s"""SELECT ${leftCols.mkString(", ")}, 1 AS __tag,
         |    CAST(NULL AS $packType) AS __rpack
         |  FROM $leftView
         |  UNION ALL
         |  SELECT ${rightSelect.mkString(", ")}, 0 AS __tag, $packSql AS __rpack
         |  FROM $rightView WHERE $notNull""".stripMargin
    (u, leftCols)
  }

  private def outSelect(leftCols: Seq[String], valueCols: Seq[String],
                        timeCol: String, inTol: String): String =
    (leftCols ++
      valueCols.map(c => s"CASE WHEN $inTol THEN __asof.$c END AS $c") :+
      s"CASE WHEN $inTol THEN __asof.__rt END AS asof_$timeCol").mkString(", ")

  private def directionalSql(spark: SparkSession, leftView: String,
                             rightView: String, timeCol: String,
                             keys: Seq[String], valueCols: Seq[String],
                             tolerance: Option[Long], forward: Boolean): String = {
    val (u, leftCols) = unionSql(spark, leftView, rightView, timeCol, keys, valueCols)
    val ord = if (forward) "DESC NULLS FIRST" else "ASC NULLS FIRST"
    val age =
      if (forward) s"__asof.__rt - CAST($timeCol AS BIGINT)"
      else s"CAST($timeCol AS BIGINT) - __asof.__rt"
    val inTol = tolerance match {
      case Some(t) => s"(__asof IS NOT NULL AND $age <= $t)"
      case None => "__asof IS NOT NULL"
    }
    s"""WITH __u AS (
       |  $u
       |)
       |SELECT ${outSelect(leftCols, valueCols, timeCol, inTol)}
       |FROM (
       |  SELECT *, last(__rpack, true) OVER (
       |    PARTITION BY ${keys.mkString(", ")}
       |    ORDER BY $timeCol $ord, __tag ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __asof
       |  FROM __u
       |) WHERE __tag = 1""".stripMargin
  }

  /** Nearest as-of join SQL: |rightTime − leftTime| minimized, exact
    * ties prefer the backward match; two frames over one sort. */
  def nearestSql(spark: SparkSession, leftView: String, rightView: String,
                 timeCol: String, keys: Seq[String], valueCols: Seq[String],
                 tolerance: Option[Long] = None): String = {
    val (u, leftCols) = unionSql(spark, leftView, rightView, timeCol, keys, valueCols)
    val t = s"CAST($timeCol AS BIGINT)"
    val chosen =
      s"""CASE WHEN $timeCol IS NULL THEN NULL
         |      WHEN __back IS NOT NULL AND __fwd IS NOT NULL THEN
         |        CASE WHEN $t - __back.__rt <= __fwd.__rt - $t
         |             THEN __back ELSE __fwd END
         |      WHEN __back IS NOT NULL THEN __back
         |      ELSE __fwd END""".stripMargin
    val inTol = tolerance match {
      case Some(tol) => s"(__asof IS NOT NULL AND abs(__asof.__rt - $t) <= $tol)"
      case None => "__asof IS NOT NULL"
    }
    s"""WITH __u AS (
       |  $u
       |)
       |SELECT ${outSelect(leftCols, valueCols, timeCol, inTol)}
       |FROM (
       |  SELECT *, $chosen AS __asof
       |  FROM (
       |    SELECT *,
       |      last(__rpack, true) OVER (
       |        PARTITION BY ${keys.mkString(", ")}
       |        ORDER BY $timeCol ASC NULLS FIRST, __tag ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __back,
       |      first(__rpack, true) OVER (
       |        PARTITION BY ${keys.mkString(", ")}
       |        ORDER BY $timeCol ASC NULLS FIRST, __tag ASC
       |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS __fwd
       |    FROM __u
       |  )
       |) WHERE __tag = 1""".stripMargin
  }

  /** Convenience: run the generated SQL. */
  def backward(spark: SparkSession, leftView: String, rightView: String,
               timeCol: String, keys: Seq[String], valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame =
    spark.sql(backwardSql(spark, leftView, rightView, timeCol, keys, valueCols, tolerance))

  def forward(spark: SparkSession, leftView: String, rightView: String,
              timeCol: String, keys: Seq[String], valueCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame =
    spark.sql(forwardSql(spark, leftView, rightView, timeCol, keys, valueCols, tolerance))

  def nearest(spark: SparkSession, leftView: String, rightView: String,
              timeCol: String, keys: Seq[String], valueCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame =
    spark.sql(nearestSql(spark, leftView, rightView, timeCol, keys, valueCols, tolerance))
}
