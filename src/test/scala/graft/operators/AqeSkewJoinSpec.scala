package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The third leg of the skew story (bucketing and salting being the
  * other two): AQE's runtime skew-join split. When both join sides are
  * big (salting's replicate-the-small-side trade does not apply), the
  * engine's own answer is `spark.sql.adaptive.skewJoin` — the runtime
  * re-plan that splits an oversized shuffle partition into sub-reads.
  * This spec drives a genuinely skewed big-big sort-merge join with
  * the split thresholds lowered to test scale and asserts the FINAL
  * adaptive plan actually marked the join skew-handled — proving the
  * knob works here rather than citing the docs. */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits the skewed partition of a big-big sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: any partition over ~16KB and 2x the
      // median counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left side is one key; the right side is big enough
      // that broadcasting is off the table
      val left = spark.range(200000).select(
        when(col("id") % 20 < 19, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
        concat(lit("left_payload_"), col("id")).as("lv"))
      // one right row per key: skew detection keys off the map-side
      // partition SIZE of the left's hot key, so a unique-key right
      // side triggers the identical split at ~50x less join output
      val right = spark.range(1000).select(
        col("id").as("k"),
        concat(lit("right_payload_"), col("id")).as("rv"))
      val joined = left.join(right, "k")
      // run the join's OWN QueryExecution (count() would plan a
      // separate aggregate query and leave this plan un-finalized)
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE must have finalized")
      assert(plan.contains("skew=true"),
        s"expected the sort-merge join to be marked skew-handled:\n" +
          plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
