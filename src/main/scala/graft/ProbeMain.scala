package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: dump a named subset of registry queries + their
  * oracle SQL for a quick check_oracle pass. args: sfDir outDir name... */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sqls = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      val q = graft.queries.Registry.byName(n)
      q.run(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$n")
      q.oracle.foreach(sqls(n) = _)
      println(s"wrote $n")
    }
    val json = sqls.map { case (k, v) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      s""""$k": "$esc""""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
