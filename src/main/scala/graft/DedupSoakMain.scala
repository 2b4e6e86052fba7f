package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-synthetic soak for the dedup/CC/incremental paths — the scale
  * claims the small-SF correctness gate can't exercise, run at 10-100M
  * rows on local[32] and recorded in BASELINE.md:
  *
  *  1. star-CC over a DEEP CHAIN graph (worst-case diameter = edge
  *     count): converges in O(log n) alternating-star rounds where
  *     min-label propagation would need diameter-many;
  *  2. the incremental NEAR-dup screen (signature index × new batch) at
  *     ~100× bench scale: index banding is map-only from stored
  *     signatures, verify runs on signatures, history text never
  *     re-read.
  *
  * Args: [nChainEdges] [nDocs] (defaults 10M / 5M). Both inputs are
  * deterministic functions of spark.range — no files, no RNG. */
object DedupSoakMain {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-44s $s%8.2f s"); (r, s)
    }

    // ---- 1. star-CC on a chain: edges (i, i+1), diameter = nEdges ----
    val chain = spark.range(nEdges)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .localCheckpoint() // time the CC, not the generator
    var rounds = -1
    val (labels, _) = time(f"star-CC, chain of $nEdges%,d edges") {
      val l = graft.pipeline.DedupOps.connectedComponentsStar(
        chain, maxRounds = 64, onConverged = rounds = _)
      l
    }
    val nComp = labels.select(countDistinct(col("component"))).head().getLong(0)
    labels.unpersist()
    println(f"  rounds=$rounds (log2(n)=${math.log(nEdges.toDouble) / math.log(2)}%.1f), components=$nComp (expect 1)")

    // ---- 2. incremental near-dup screen at ~100x bench scale ----------
    // Deterministic ~9-word docs; every 50th batch doc duplicates a
    // history doc's text, everything else is unique. History = even ids
    // (indexed once), batch = odd ids.
    def docText(id: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 9).map(j => concat(lit("w"), (id * (2 * j + 3)) % 999983)): _*)
    val history = spark.range(0, nDocs, 2).select(col("id").as("doc_id"),
      docText(col("id")).as("text")).localCheckpoint()
    val batch = spark.range(1, nDocs, 2).select(col("id").as("doc_id"),
      when(col("id") % 50 === 1, docText(col("id") - 1))
        .otherwise(docText(col("id"))).as("text"))
      .localCheckpoint()
    val (idx, tIdx) = time(f"signature index over ${history.count()}%,d history docs") {
      graft.pipeline.DedupOps.minhashSigIndex(history, "text", "doc_id")
        .localCheckpoint() // the persisted-artifact stand-in
    }
    val (flagged, tScreen) = time(f"incremental screen of ${batch.count()}%,d batch docs") {
      graft.pipeline.DedupOps.nearDupAgainstIndex(batch, idx, "text", "doc_id")
        .count()
    }
    val expected = (nDocs / 2) / 50
    println(f"  flagged=$flagged%,d pairs (>= $expected%,d planted dups; the rest " +
      "are incidental signature collisions in the synthetic vocab), " +
      f"index=$tIdx%.1fs screen=$tScreen%.1fs")
    spark.stop()
  }
}
