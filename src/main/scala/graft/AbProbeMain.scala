package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B: the ×10 exact stored probe with the block-max lane
  * forced OFF vs ON, back to back in one session — the same-box
  * comparison the scale bench cannot give across code versions. */
object AbProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val mult = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.queries.Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = base.crossJoin(spark.range(mult.toLong)
        .select(col("id").as("__rep")))
      .select((col("doc_id") * mult + col("__rep")).as("doc_id"),
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"),
            col("__rep").cast("string"))).as("text"))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_ab").toString
    graft.pipeline.RetrievalOps.writeRetrievalIndex(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", s"$root/rt")
    val workload = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.pipeline.TextOps.tokens(col("text")), 1, 4),
          " ").as("query_text")).localCheckpoint()
    def leg(label: String, conf: String): Double = {
      spark.conf.set(graft.pipeline.RetrievalOps.ExactBlockMaxMinRowsKey,
        conf)
      val t0 = System.nanoTime()
      val n = graft.pipeline.RetrievalOps.bm25AgainstStoredIndex(spark,
        s"$root/rt", workload, "query_id", "query_text", 10).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"AB $label: $s%.2f s ($n rows)")
      s
    }
    // uncounted warmup, then alternate to cancel warm-cache drift
    leg("warmup(off)", Long.MaxValue.toString)
    val offs = collection.mutable.ArrayBuffer[Double]()
    val ons = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 3) {
      offs += leg(s"off$i", Long.MaxValue.toString)
      ons += leg(s"on$i", "0")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"AB MEDIANS: off=${med(offs.toSeq)}%.2f s on=${med(ons.toSeq)}%.2f s")
    spark.stop()
  }
}
