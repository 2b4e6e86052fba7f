package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: dump a named subset of registry queries + their
  * oracle SQL for a quick check_oracle pass. args: sfDir outDir name... */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sqls = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      val q = graft.queries.Registry.byName(n)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$n")
      val s = (System.nanoTime() - t0) / 1e9
      q.oracle.foreach(sqls(n) = _)
      println(f"wrote $n ($s%.2f s)")
    }
    // full JSON string escaping (not just backslash/quote/newline): a
    // tab or other control char in an oracle SQL must not produce an
    // invalid oracle_sql.json
    def jstr(v: String): String = v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = sqls.map { case (k, v) => s""""${jstr(k)}": "${jstr(v)}"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
