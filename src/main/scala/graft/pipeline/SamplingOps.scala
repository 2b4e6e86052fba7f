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

  /** Deterministic train/validation/test split by id hash: bucket =
    * hash32("split:" || id) mod 1000; the first `testPermille` buckets
    * are test, the next `valPermille` are validation, the rest train.
    * Map-only — no shuffle, no rand(), no global coordination: any
    * executor can answer "which split is this doc in" from the id
    * alone, which is what makes the split stable across corpus
    * versions (adding or removing OTHER docs never moves a doc between
    * splits — the property rand()-based splits lack). The "split:"
    * prefix decorrelates the split hash from the sampling hashes
    * above, so sampling never biases a split. Because the buckets are
    * nested, GROWING a split keeps its previous members (test at 20
    * permille is a superset of test at 10) — splits can be enlarged
    * without invalidating earlier eval runs. Hash-uniformity makes the
    * split proportional within any stratum (per-source, per-language)
    * without a stratified pass. */
  def assignSplit(df: DataFrame, idCol: String,
                  valPermille: Int, testPermille: Int): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"invalid split sizes: val=$valPermille test=$testPermille")
    val clash = df.columns.toSet.intersect(Set("split"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val bucket = pmod(
      HashFns.hash32(concat(lit("split:"), col(idCol).cast("string"))),
      lit(1000L))
    df.withColumn("split",
      when(bucket < testPermille, lit("test"))
        .when(bucket < testPermille + valPermille, lit("validation"))
        .otherwise(lit("train")))
  }

  /** DuckDB fragment for the split expression over id column `idExpr`. */
  def assignSplitSql(idExpr: String, valPermille: Int, testPermille: Int): String = {
    val b = s"${HashFns.hash32Sql(s"'split:' || CAST($idExpr AS VARCHAR)")} % 1000"
    s"CASE WHEN $b < $testPermille THEN 'test' " +
      s"WHEN $b < ${testPermille + valPermille} THEN 'validation' " +
      s"ELSE 'train' END"
  }

  /** Deterministic training-shard layout: shard = hash32("shard:"||id)
    * mod nShards, position within the shard = dense rank of the id's
    * hash among its shard-mates. The export layout for training data —
    * a pseudo-random global interleave (reading shard files in position
    * order visits the corpus in hash order, so no source/time clumping)
    * that is fully reproducible from ids alone. Shard assignment is
    * map-only; positions are one window shuffle keyed on the shard.
    * Each shard's position numbering is a single-task sort at shard
    * granularity — scale by RAISING nShards (production exports use
    * thousands of shards, each a few GB), never by one giant shard. */
  def shardLayout(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val clash = df.columns.toSet.intersect(Set("shard", "shard_pos"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val h = HashFns.hash32(concat(lit("shard:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
  }

  /** Materialize the [[shardLayout]] as a parquet export PARTITIONED BY
    * shard: each shard is its own directory, rows carry their dense
    * in-shard position, and a reader pulling one shard
    * (`.filter(col("shard") === k)`) is partition-pruned at the source —
    * it never touches the other shards' files. The window's exchange
    * already clusters rows by shard, so each writer task emits files
    * for the shards it holds (no second shuffle); the in-partition sort
    * keeps each file in position order so a sequential read IS the
    * training order. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
                  path: String): Unit =
    shardLayout(df, idCol, nShards)
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

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

  /** Temperature-rebalanced source mixing — the α-sampling of
    * multilingual LM corpora (exponentiated-weight sampling as in XLM,
    * arXiv:1901.07291 §3.1, and mT5's α; here α = 1/2): admit each doc
    * of source s
    * with rate √(n_min/n_s), so per-source KEPT counts scale as √n_s.
    * Large sources are tempered toward the small ones, and the
    * smallest source is kept in full (its rate is exactly 1 — a
    * deterministic invariant, not a statistical one). Rates are
    * data-driven from the observed source counts, unlike
    * [[mixtureSample]]'s fixed rate map.
    *
    * No sqrt is ever evaluated: a doc whose id hashes to ppm h is
    * admitted iff h² · n_s < PPM² · n_min, cross-multiplied in
    * DECIMAL(38,0) (h² ≤ 10¹², × any int64 count stays < 10³¹) —
    * exact integers on both engines at any corpus size, and the
    * predicate is monotone in h so squaring preserves the threshold.
    * Cost: one per-source count aggregate (s rows, broadcast back) +
    * a map-only filter; the n_min scalar is a planning-time snapshot
    * like the layout min/max. */
  def temperatureSample(df: DataFrame, idCol: String,
                        sourceCol: String): DataFrame = {
    val PPM = 1000000L
    val clash = df.columns.toSet.intersect(Set("__ts_n", "__ts_h"))
    require(clash.isEmpty, s"input already has reserved columns: $clash")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__ts_n"))
    val nMin = Option(counts.agg(min(col("__ts_n"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // h is projected once before the join so the md5 underneath is
    // single-eval even though the predicate squares it; the coalesce is
    // unreachable (hash of a non-null cast is non-null) but marks the
    // column non-nullable, so constraint inference cannot push an
    // isnotnull(md5…) re-evaluation into the scan's DataFilters
    df.withColumn("__ts_h",
        coalesce(pmod(HashFns.hash32(col(idCol).cast("string")), lit(PPM)),
          lit(0L)))
      .join(broadcast(counts), Seq(sourceCol))
      .filter(dec(col("__ts_h")) * dec(col("__ts_h")) * dec(col("__ts_n")) <
        dec(lit(PPM)) * dec(lit(PPM)) * dec(lit(nMin)))
      .drop("__ts_n", "__ts_h")
  }
}
