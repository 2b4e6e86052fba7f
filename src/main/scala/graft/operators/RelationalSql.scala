package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-recipe generators for the relational operators, completing the
  * `spark.sql` surface started by [[AsOfJoinSql]]: each emits plain
  * Spark SQL over registered views with the SAME plan shape and
  * semantics as the Scala API — binned equi-join for the range join,
  * lag + running-last windows for sessionization. Round-trip specs
  * assert row equality against the Scala forms. Column lists come from
  * view-schema introspection (planning-time, no data access).
  */
object RelationalSql {

  /** Floor division as SQL, overflow-free at any long — mirrors
    * RangeJoin.binOf: truncated `div`, stepped down when truncation
    * rounded a negative value toward zero. */
  private def binSql(e: String, w: Long): String = {
    val t = s"CAST($e AS BIGINT)"
    s"(($t div $w) - (CASE WHEN $t < 0 AND ($t div $w) * $w != $t THEN 1 ELSE 0 END))"
  }

  /** [[RangeJoin.joinPointInInterval]] as SQL: bin both sides, equi-join
    * on (keys, bin) with the exact range residual; over-long/sentinel
    * intervals take the keys-only fallback branch of the UNION ALL
    * (length routed in double arithmetic — cannot overflow). */
  def rangeJoinSql(spark: SparkSession, leftView: String, rightView: String,
                   timeCol: String, startCol: String, endCol: String,
                   keys: Seq[String], binWidth: Long,
                   maxFanOut: Long = 1024): String = {
    require(binWidth >= 1 && maxFanOut >= 1 && keys.nonEmpty)
    val lCols = spark.table(leftView).columns.toSeq
    val rColsAll = spark.table(rightView).columns.toSeq
    val clash = (lCols ++ rColsAll).toSet.intersect(Set("__rj_bin"))
    require(clash.isEmpty, s"views already have reserved columns: $clash")
    val rCols = rColsAll.filterNot(keys.contains)
    val out = (lCols.map(c => s"l.$c") ++ rCols.map(c => s"r.$c")).mkString(", ")
    val on = keys.map(c => s"l.$c = r.$c").mkString(" AND ")
    val range = s"l.$timeCol >= r.$startCol AND l.$timeCol < r.$endCol"
    val shortIv =
      s"(CAST($endCol AS DOUBLE) - CAST($startCol AS DOUBLE)) <= ${maxFanOut.toDouble * binWidth.toDouble}"
    val valid = s"$startCol IS NOT NULL AND $endCol IS NOT NULL AND $startCol < $endCol"
    s"""WITH __rv AS (
       |  SELECT * FROM $rightView WHERE $valid
       |)
       |SELECT $out
       |FROM (SELECT *, ${binSql(timeCol, binWidth)} AS __rj_bin FROM $leftView) l
       |JOIN (
       |  SELECT *,
       |    explode(sequence(${binSql(startCol, binWidth)}, ${binSql(s"($endCol - 1)", binWidth)})) AS __rj_bin
       |  FROM __rv WHERE $shortIv
       |) r ON $on AND l.__rj_bin = r.__rj_bin AND $range
       |UNION ALL
       |SELECT $out
       |FROM $leftView l JOIN (SELECT * FROM __rv WHERE NOT ($shortIv)) r
       |  ON $on AND $range""".stripMargin
  }

  /** [[Sessionize.withSessionIds]] as SQL: lag marker + running
    * last-non-null over one sort. */
  def sessionizeSql(spark: SparkSession, view: String, timeCol: String,
                    keys: Seq[String], maxGap: Long,
                    outCol: String = "session_start"): String = {
    require(keys.nonEmpty)
    val clash = spark.table(view).columns.toSet
      .intersect(Set("__sess_marker", outCol))
    require(clash.isEmpty, s"view already has reserved/output columns: $clash")
    val k = keys.mkString(", ")
    val lagT = s"lag($timeCol) OVER (PARTITION BY $k ORDER BY $timeCol)"
    s"""SELECT * EXCEPT (__sess_marker),
       |  last(__sess_marker, true) OVER (
       |    PARTITION BY $k ORDER BY $timeCol
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS $outCol
       |FROM (
       |  SELECT *, CASE WHEN $lagT IS NULL OR $timeCol - $lagT > $maxGap
       |            THEN $timeCol END AS __sess_marker
       |  FROM $view
       |)""".stripMargin
  }

  def rangeJoin(spark: SparkSession, leftView: String, rightView: String,
                timeCol: String, startCol: String, endCol: String,
                keys: Seq[String], binWidth: Long,
                maxFanOut: Long = 1024): DataFrame =
    spark.sql(rangeJoinSql(spark, leftView, rightView, timeCol, startCol,
      endCol, keys, binWidth, maxFanOut))

  def sessionize(spark: SparkSession, view: String, timeCol: String,
                 keys: Seq[String], maxGap: Long): DataFrame =
    spark.sql(sessionizeSql(spark, view, timeCol, keys, maxGap))
}
