package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * @param name   stable driver-facing key
  * @param run    DataFrame implementation (the engine under test)
  * @param oracle equivalent DuckDB SQL over the same tables; None for ops
  *               not expressible in SQL (driver then records a weaker
  *               rows-only check)
  * @param bench  include in the headline benchmark set
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  def all: Seq[GraftQuery] =
    BookQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++
      RetrievalQueries.all ++ FleetQueries.all ++ GraphQueries.all

  def byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}

/** Readers for the driver tables (TESTDATA.md) — explicit schemas via
  * the source layer. */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.TableSources.read(spark, sfDir, name)
}
