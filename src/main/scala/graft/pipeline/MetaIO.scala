package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}

/** Shared meta-pointer read for every persisted artifact (MinHash /
  * decontamination / LM / k-means / HLL / IVF lifecycles).
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

  /** First row of `$path/meta`, retrying once across the swap window.
    * `label` names the artifact in the error ("lm model", "hll
    * index"); `kind` is its category noun ("model", "index"). */
  def readMetaRow(spark: SparkSession, path: String, label: String,
                  kind: String): Row = {
    def attempt(): Array[Row] = spark.read.parquet(s"$path/meta").collect()
    val rows =
      try attempt()
      catch {
        case _: Exception =>
          Thread.sleep(200L)
          try attempt()
          catch { case e: Exception => throw new IllegalStateException(
            s"$label at $path has no readable meta — not a${nArticle(kind)}" +
              s" $kind artifact, or an interrupted write that never " +
              "committed", e) }
      }
    rows(0)
  }

  private def nArticle(kind: String): String =
    if ("aeiou".indexOf(kind.headOption.getOrElse(' ').toLower) >= 0) "n"
    else ""
}
