package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: deterministic sampling, per-source
  * mixture weighting, and per-group caps.
  *
  * All decisions hash the DOCUMENT ID (engine-portable MD5 via HashFns),
  * never rand(): the same doc gets the same verdict on any cluster size,
  * partitioning, or rerun — reproducible corpus builds, exact oracles,
  * and stable diffs between pipeline versions. Every operator is a
  * map-only filter or one windowed shuffle; nothing samples through the
  * driver.
  */
object SamplingOps {

  /** Deterministic Bernoulli sampling: keep a doc iff
    * hash32(id) mod 1000 < permille. Map-only. */
  def sampleByHash(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(pmod(HashFns.hash32(col(idCol).cast("string")), lit(1000L)) < permille)
  }

  /** Mixture sampling: a per-source keep rate (permille), e.g.
    * web → 300, code → 1000, forums → 100. Sources missing from the map
    * fall back to `defaultPermille` (0 = drop unknown sources). The rate
    * lookup is a when-chain over the (small) source universe — map-only,
    * no join. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    ratesPermille: Map[String, Int],
                    defaultPermille: Int = 0): DataFrame = {
    require((ratesPermille.values ++ Seq(defaultPermille))
      .forall(p => p >= 0 && p <= 1000), "permille out of range")
    val rate = ratesPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (src, p)) =>
        when(col(sourceCol) === src, lit(p)).otherwise(acc)
      }
    df.filter(pmod(HashFns.hash32(col(idCol).cast("string")), lit(1000L)) < rate)
  }

  /** Per-group TOKEN budget: keep docs, drawn in deterministic hash
    * order, while the group's running token total stays under `budget` —
    * "sample ~1B tokens per source", the unit data mixtures are actually
    * specified in (a doc-count cap over-weights sources with long
    * documents). A doc is kept iff the tokens BEFORE it (exclusive
    * prefix) are under budget, so every non-empty group keeps at least
    * one doc and the total overshoots by at most one document — the
    * standard greedy-prefix semantics, deterministic and
    * partitioning-independent. One shuffle on the group keys.
    *
    * Token-count contract: counts must be non-negative — a negative
    * count would let the running total shrink and silently break the
    * "overshoots by at most one document" bound, so any negative value
    * fails the job loudly (a codegen'd per-row check, not an extra
    * pass). A NULL count contributes 0 to the running total and the doc
    * is kept whenever its exclusive prefix is under budget (sum ignores
    * nulls on both engines, so the oracle agrees). */
  def capTokensPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(groupCols.nonEmpty,
      "capTokensPerGroup requires at least one group column")
    val clash = df.columns.toSet.intersect(Set("__cap_cum"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val tok = col(tokenCol).cast("long")
    val guarded = when(tok < 0, raise_error(concat(
        lit(s"capTokensPerGroup: negative $tokenCol for $idCol="),
        col(idCol).cast("string"))).cast("long"))
      .otherwise(tok)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(HashFns.hash32(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cap_cum",
        coalesce(sum(guarded).over(w), lit(0L)))
      .filter(col("__cap_cum") < budget)
      .drop("__cap_cum")
  }

  /** Per-group cap: keep at most `k` docs per group, selected by hash
    * order (a deterministic uniform draw — NOT first-k by id, which
    * would bias toward old documents). The anti-domination gate that
    * stops one crawl bucket from flooding the mixture. One shuffle on
    * the group keys. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "capPerGroup requires at least one group column")
    val clash = df.columns.toSet.intersect(Set("__cap_rn"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(HashFns.hash32(col(idCol).cast("string")), col(idCol))
    df.withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= k)
      .drop("__cap_rn")
  }
}
