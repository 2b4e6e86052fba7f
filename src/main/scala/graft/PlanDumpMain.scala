package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Regenerates the executed-plan snippets in PLANS.md: prints each
  * requested query's `executedPlan` (sf0.01, AQE on) between BEGIN/END
  * markers for easy extraction. */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_simhash", "q_minhash_sig", "q1_pricing_summary",
      "q_embed_ivfpq_topk", "q_decontaminate_bloom", "q_zorder_layout",
      "q_inverted_index", "q_source_overlap")
    names.foreach { n =>
      val plan = Registry.byName(n).run(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString
      println(s"===BEGIN $n===")
      println(plan.trim.linesIterator.take(40).mkString("\n"))
      println(s"===END $n===")
    }
    spark.stop()
  }
}
