package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Fleet observability over the MANAGED ARTIFACTS — the operator's
  * dashboard across every stored lifecycle (digest/MinHash/media-hash/
  * retrieval/WARC/decontam/LM/HLL/quantile/IVF-PQ/…): what does each
  * artifact's meta pointer say, and what does its on-disk epoch layout
  * actually hold. Two long-format relations with STABLE schemas, so one
  * dashboard reads any mix of artifact kinds without per-kind columns:
  *
  *  - [[artifactMeta]]  — (artifact, key, value): the meta row,
  *    key-per-row, values as strings. Meta schemas differ per lifecycle
  *    (a digest index carries bloom geometry, the WARC index carries
  *    record counts); the long format carries them all.
  *  - [[artifactLayout]] — (artifact, relation, n_epochs, min_epoch,
  *    max_epoch, n_files, n_bytes): one row per epoch'd relation root,
  *    from a filesystem walk.
  *
  * Both are driver-side walks: the fleet is TENS of artifacts (the
  * 100-TB concern is the data inside them, not their count), each
  * contributing one meta read and one directory listing — and the
  * output is a dashboard, not a corpus. Health reading: an artifact is
  * healthy when its layout's epoch range COVERS the meta window (the
  * grace generation below the window base is expected right after a
  * compaction — [[MetaIO.pruneEpochs]] keeps exactly one), and file
  * counts per relation are what the compaction policy bounds. */
object FleetOps {

  private val MetaSchema = StructType(Seq(
    StructField("artifact", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  private val LayoutSchema = StructType(Seq(
    StructField("artifact", StringType, nullable = false),
    StructField("relation", StringType, nullable = false),
    StructField("n_epochs", LongType, nullable = false),
    StructField("min_epoch", LongType, nullable = true),
    StructField("max_epoch", LongType, nullable = true),
    StructField("n_files", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** The meta rows of the named artifacts, key-per-row, values
    * rendered as strings (integral types print exactly; a missing or
    * torn meta surfaces as [[MetaIO.readMetaRow]]'s loud error — a
    * dashboard that silently skipped a broken artifact would hide the
    * one row that matters). */
  def artifactMeta(spark: SparkSession,
                   artifacts: Seq[(String, String)]): DataFrame = {
    val rows = artifacts.flatMap { case (name, path) =>
      val r = MetaIO.readMetaRow(spark, path, s"artifact '$name'", "index")
      r.schema.fields.map { f =>
        val v = r.getAs[Any](f.name)
        Row(name, f.name, if (v == null) null else v.toString)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), MetaSchema)
  }

  /** The on-disk epoch layout of the named artifacts: for every child
    * of `path` that contains `e<digits>` epoch dirs, the epoch range
    * and the committed data-file/byte tallies (hidden and marker files
    * excluded — the same visibility rule Spark's listing applies). */
  def artifactLayout(spark: SparkSession,
                     artifacts: Seq[(String, String)]): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val rows = artifacts.flatMap { case (name, path) =>
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(hconf)
      if (!fs.exists(root)) Seq.empty[Row]
      else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { rel =>
        val epochs = fs.listStatus(rel.getPath).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isDirectory && n.length > 1 && n.startsWith("e") &&
            n.drop(1).forall(_.isDigit)
        }
        if (epochs.isEmpty) None
        else {
          val ids = epochs.map(_.getPath.getName.drop(1).toLong)
          var files = 0L
          var bytes = 0L
          epochs.foreach { e =>
            val it = fs.listFiles(e.getPath, true)
            while (it.hasNext) {
              val f = it.next()
              val n = f.getPath.getName
              if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) {
                files += 1L
                bytes += f.getLen
              }
            }
          }
          Some(Row(name, rel.getPath.getName, ids.size.toLong,
            ids.min, ids.max, files, bytes))
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LayoutSchema)
  }
}
