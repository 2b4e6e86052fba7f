package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway 10x decomposition probe — DELETED before commit
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.pipeline.{RetrievalOps, TextOps, Checkpoints}
    val mult = 10
    val base = graft.queries.Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val docs = base.crossJoin(
        spark.range(mult.toLong).select(col("id").as("__rep")))
      .select((col("doc_id") * mult + col("__rep")).as("doc_id"),
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"),
            col("__rep").cast("string"))).as("text"))
      .localCheckpoint()
    println("docs: " + docs.count())
    val evenHalf = docs.filter(col("doc_id") % 2 === 0)
    val workload = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 4), " ")
          .as("query_text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_scratch10x").toString
    time("build positional index") {
      RetrievalOps.writeRetrievalIndex(evenHalf, "text", "doc_id",
        s"$root/rtp", withPositions = true)
    }
    // decompose the phrase matcher by hand over the stored relations
    val meta = RetrievalOps.readRetrievalIndexMeta(spark, s"$root/rtp")
    val pt = RetrievalOps.phraseTerms(workload, "query_id", "query_text")
    val qt = pt.select(col("query_id"), col("token")).distinct()
    import spark.implicits._
    val terms = qt.select(col("token")).distinct().as[String].collect().sorted
    val pp = time("sever stored positions (term-filtered)") {
      Checkpoints.sever(spark.read.parquet(
          (meta.base to meta.epoch).map(e => s"$root/rtp/positions/e$e"): _*)
        .filter(col("token").isin(terms.toSeq: _*)))
    }
    println("pp rows: " + pp.count())
    import org.apache.spark.sql.expressions.Window
    val tocc = pp.groupBy(col("token")).agg(count(lit(1)).as("__tocc"))
    val rarest = pt.join(broadcast(tocc), Seq("token"), "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(coalesce(col("__tocc"), lit(0L)).asc, col("i").asc)))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("token"), col("i").as("__ri"))
    val starts = pp.join(broadcast(rarest), Seq("token"))
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("__ri") + 1L).as("__start"))
      .filter(col("__start") >= 1L)
    val startsS = time("starts (sever)") { Checkpoints.sever(starts) }
    println("starts rows: " + startsS.count())
    val probes = startsS.join(broadcast(pt), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("__start"), col("m"),
        (col("__start") + col("i") - 1L).as("pos"), col("token"))
    val occ = time("verify join + rollups") {
      Checkpoints.sever(probes.join(pp, Seq("token", "doc_id", "pos"))
        .groupBy(col("query_id"), col("doc_id"), col("__start"), col("m"))
        .agg(count(lit(1)).as("__nm"))
        .filter(col("__nm") === col("m"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences")))
    }
    println("match pairs: " + occ.count())
    spark.stop()
  }
}
