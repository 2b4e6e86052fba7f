package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}

/** Shared meta-pointer read + epoch garbage collection for every
  * persisted artifact (MinHash / decontamination / LM / k-means / HLL /
  * IVF lifecycles).
  *
  * Each lifecycle swaps its meta via sideways write + delete + rename —
  * meta commits LAST, so epoch dirs are immutable and an interrupted
  * step leaves the previous pointer in place. The delete+rename pair is
  * NOT atomic though: a reader landing in the window between the two
  * filesystem ops finds no meta dir and, without this helper, threw a
  * misleading "not an artifact" error for a perfectly healthy index
  * mid-append. One bounded retry after a short pause covers the window
  * (the swap is two fast metadata ops); a second miss means the
  * artifact genuinely is not there — or a build died before its first
  * commit — and the loud error stands. A truly atomic pointer would
  * need a single-file rename-over, which parquet directory outputs
  * don't give us on every Hadoop filesystem. */
private[graft] object MetaIO {

  /** Only a MISSING meta dir is the swap-window signature; any other
    * read failure (corrupt footer, schema mismatch, permissions) is a
    * real error that a 200 ms pause cannot fix — retrying it would just
    * pay a blind sleep plus a second full read before failing anyway. */
  private def isPathMissing(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException => true
    case a: org.apache.spark.sql.AnalysisException =>
      Option(a.getCondition).exists(_.startsWith("PATH_NOT_FOUND")) ||
        a.getMessage.contains("Path does not exist")
    case _ => false
  }

  /** First row of `$path/meta`, retrying once across the swap window.
    * `label` names the artifact in the error ("lm model", "hll
    * index"); `kind` is its category noun ("model", "index"). Retries
    * ONLY the path-not-found swap signature; everything else fails
    * fast, untouched. */
  def readMetaRow(spark: SparkSession, path: String, label: String,
                  kind: String): Row = {
    def attempt(): Array[Row] = spark.read.parquet(s"$path/meta").collect()
    val rows =
      try attempt()
      catch {
        case e: Exception if isPathMissing(e) =>
          Thread.sleep(200L)
          try attempt()
          catch { case e2: Exception if isPathMissing(e2) =>
            throw new IllegalStateException(
              s"$label at $path has no readable meta — not a${nArticle(kind)}" +
                s" $kind artifact, or an interrupted write that never " +
                "committed", e2) }
      }
    rows(0)
  }

  /** Epoch garbage collection, shared by every epoch'd lifecycle:
    * delete `e<N>` children with N < `keepFrom` under each relation
    * root. Callers pass the epoch being SUPERSEDED as `keepFrom`, so
    * the previous epoch survives one append's grace — a reader that
    * resolved the old meta just before the swap may still be probing
    * it — and everything older goes. Without this, an append-heavy
    * deployment leaks one full artifact copy per append (a daily
    * append leaves ~365 stale epochs a year). Idempotent; a missing
    * root (first commit) is a no-op; non-epoch children are never
    * touched. */
  def pruneEpochs(spark: SparkSession, roots: Seq[String],
                  keepFrom: Long): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    roots.foreach { r =>
      val root = new org.apache.hadoop.fs.Path(r)
      val fs = root.getFileSystem(hconf)
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        if (name.length > 1 && name.startsWith("e") &&
            name.drop(1).forall(_.isDigit) &&
            name.drop(1).toLong < keepFrom)
          fs.delete(st.getPath, true)
      }
    }
  }

  private def nArticle(kind: String): String =
    if ("aeiou".indexOf(kind.headOption.getOrElse(' ').toLower) >= 0) "n"
    else ""
}
