package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED quality classifier over hashed bag-of-words features — the
  * standard "model-filtered data" stage of an LLM data pipeline
  * (fastText-style lang/quality filters; CCNet, Wenzek et al. 2020),
  * in the repo's integer-exact discipline.
  *
  * The model is multinomial Naive Bayes with add-one smoothing over
  * the [[TextOps.hashedBowFeatures]] space (dim buckets, so the weight
  * relation is bounded at `dim` rows and BROADCASTS at any corpus
  * scale — the 100 TB serving shape is a map-side dot product). The
  * per-class posterior is scored in the [[TextOps.bigramLmScore]]
  * convention: fixed-point per-token likelihood terms SUMMED per doc
  * (an additive surrogate of the log-posterior — the standard
  * integer-exact trade, stated plainly: monotone per term, not a true
  * product posterior), plus a fixed-point class prior:
  *
  *   term_c(d)  = ⌊(cnt(d, c) + 1)·10⁶ / (T_c + dim)⌋   (per feature d)
  *   score_c(x) = ⌊N_c·10⁶ / N⌋ + Σ_d n_x(d)·term_c(d)
  *   predicted  = score_pos ≥ score_neg                  (ties → pos)
  *
  * where cnt(d, c) = class c's token count in bucket d, T_c = class
  * c's total tokens, N_c = class c's docs. Every signal is BIGINT
  * floor arithmetic — bit-reproducible at any parallelism, and the
  * DuckDB oracle recomputes counts, scores and the argmax exactly.
  *
  * Overflow headroom: term ≤ 10⁶·(T_c+1)/(T_c+dim) < 10⁶·... bounded
  * by 10⁶; Σ n_x(d)·term ≤ 10⁶ · doc tokens — a doc would need ~10¹²
  * tokens to overflow int64.
  */
object ClassifierOps {

  /** Fixed-point scale of the likelihood and prior terms. */
  val Scale = 1000000L

  private def div(a: Column, b: Column): Column = call_function("div", a, b)

  /** Per-bucket class counts from a labeled slice: (dim, c_pos,
    * c_neg) — at most `dim` rows. Rows with a NULL label train
    * neither class (they are dropped, matching the oracle's FILTER
    * semantics); null text contributes the doc to its class prior but
    * no token counts. */
  private def countsOf(train: DataFrame, textCol: String, idCol: String,
                       labelCol: String, dim: Int): DataFrame = {
    val f = TextOps.hashedBowFeatures(train, textCol, idCol, dim)
    val labels = train.select(col(idCol), col(labelCol).as("__lab"))
    f.join(labels, Seq(idCol))
      .groupBy(col("dim"))
      .agg(sum(when(col("__lab"), col("n")).otherwise(0L)).as("c_pos"),
        sum(when(!col("__lab"), col("n")).otherwise(0L)).as("c_neg"))
  }

  /** One-row totals: (n_pos, n_neg) doc counts from the labels,
    * (t_pos, t_neg) token totals rolled up from the counts relation
    * itself. */
  private def totalsOf(train: DataFrame, idCol: String, labelCol: String,
                       counts: DataFrame): DataFrame = {
    val docs = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("n_neg"))
    val toks = counts.agg(
      coalesce(sum(col("c_pos")), lit(0L)).as("t_pos"),
      coalesce(sum(col("c_neg")), lit(0L)).as("t_neg"))
    docs.crossJoin(toks).select(
      coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      col("t_pos"), col("t_neg"))
  }

  /** Score `df` against a (counts, totals, dim) model — the map-side
    * dot product: features left-join the broadcast counts (an unseen
    * bucket still carries its smoothing term), one per-doc rollup,
    * prior added from the broadcast one-row totals. Every input doc
    * emits a row (featureless docs score prior-only). The in-plan
    * guard fails loudly on an empty/one-class-empty train slice
    * (N = 0 would divide by zero — there is no model to score
    * against). */
  private def scoreCore(df: DataFrame, textCol: String, idCol: String,
                        counts: DataFrame, totals: DataFrame,
                        dim: Int): DataFrame = {
    val f = TextOps.hashedBowFeatures(df, textCol, idCol, dim)
    val termPos = div((coalesce(col("c_pos"), lit(0L)) + lit(1L)) *
      lit(Scale), col("t_pos") + lit(dim.toLong))
    val termNeg = div((coalesce(col("c_neg"), lit(0L)) + lit(1L)) *
      lit(Scale), col("t_neg") + lit(dim.toLong))
    val sums = f.join(broadcast(counts), Seq("dim"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(sum(col("n") * termPos).as("__sp"),
        sum(col("n") * termNeg).as("__sn"))
    val n = col("n_pos") + col("n_neg")
    val guarded = totals.filter(assert_true(col("n_pos") + col("n_neg") > 0,
      lit("nb classifier: empty train slice (no labeled docs) — " +
        "there is no model to score against")).isNull)
    df.select(col(idCol)).crossJoin(broadcast(guarded))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol),
        (div(col("n_pos") * lit(Scale), n) +
          coalesce(col("__sp"), lit(0L))).as("score_pos_micro"),
        (div(col("n_neg") * lit(Scale), n) +
          coalesce(col("__sn"), lit(0L))).as("score_neg_micro"))
      .withColumn("predicted",
        col("score_pos_micro") >= col("score_neg_micro"))
  }

  /** ONE-SHOT train + score over a single relation — the
    * [[TextOps.bigramLmScore]] shape: rows where `trainPred` is TRUE
    * (and the label is non-null) train the model, EVERY row of `df`
    * scores against it. `labelCol` must be a boolean column (the
    * positive class). Output: (id, score_pos_micro, score_neg_micro,
    * predicted). */
  def nbQualityScore(df: DataFrame, textCol: String, idCol: String,
                     labelCol: String, trainPred: Column,
                     dim: Int): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim")
    val train = df.filter(trainPred).filter(col(labelCol).isNotNull)
    val counts = Checkpoints.sever(
      countsOf(train, textCol, idCol, labelCol, dim))
    val totals = totalsOf(train, idCol, labelCol, counts)
    scoreCore(df, textCol, idCol, counts, totals, dim)
  }

  // ---- persisted NB model (train weekly, score daily) ---------------------
  //
  // The serving asset form: counts persist as ONE immutable epoch dir
  // (dim-bounded — the whole model is a broadcast), the meta row pins
  // (dim, n_pos, n_neg, t_pos, t_neg) and swaps LAST
  // (MetaIO.swapMetaRow), so a torn train is invisible and the retry
  // overwrites wholesale. Retraining is a full rebuild by design: the
  // model is slice-sized to train and the counts ARE sum-mergeable, so
  // an append fold is a natural extension when a consumer needs one —
  // omitted until then (unlike the postings/digest stores, there is no
  // unbounded history to avoid re-reading).

  private[graft] final case class NbModelMeta(
      dim: Int, nPos: Long, nNeg: Long, tPos: Long, tNeg: Long)

  private def countsDir(path: String): String = s"$path/counts/e0"

  private[graft] def readNbModelMeta(spark: SparkSession,
                                     path: String): NbModelMeta = {
    val r = MetaIO.readMetaRow(spark, path, "nb model", "model")
    NbModelMeta(r.getAs[Long]("dim").toInt, r.getAs[Long]("n_pos"),
      r.getAs[Long]("n_neg"), r.getAs[Long]("t_pos"),
      r.getAs[Long]("t_neg"))
  }

  /** Train and persist the model: counts + meta. The train slice must
    * be non-empty (loud — an empty model would divide by zero at every
    * probe; failing the weekly train job is the honest signal). */
  def writeNbModel(train: DataFrame, textCol: String, idCol: String,
                   labelCol: String, path: String, dim: Int): Unit = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim")
    val spark = train.sparkSession
    val t = train.filter(col(labelCol).isNotNull)
    countsOf(t, textCol, idCol, labelCol, dim)
      .write.mode("overwrite").parquet(countsDir(path))
    val counts = spark.read.parquet(countsDir(path))
    val tot = totalsOf(t, idCol, labelCol, counts).collect()(0)
    require(tot.getLong(0) + tot.getLong(1) > 0L,
      "writeNbModel: empty train slice (no labeled docs) — refusing " +
        "to persist a model that cannot score")
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "nb model",
      Seq((dim.toLong, tot.getLong(0), tot.getLong(1), tot.getLong(2),
          tot.getLong(3)))
        .toDF("dim", "n_pos", "n_neg", "t_pos", "t_neg"))
  }

  /** Score a batch against the STORED model — output ≡
    * [[nbQualityScore]] over the same train slice (spec-pinned): the
    * counts read back from the artifact, the totals from the meta
    * row, no training text read anywhere. */
  def scoreAgainstStoredNb(spark: SparkSession, path: String,
                           df: DataFrame, textCol: String,
                           idCol: String): DataFrame = {
    val meta = readNbModelMeta(spark, path)
    val counts = spark.read.parquet(countsDir(path))
    import spark.implicits._
    val totals = Seq((meta.nPos, meta.nNeg, meta.tPos, meta.tNeg))
      .toDF("n_pos", "n_neg", "t_pos", "t_neg")
    scoreCore(df, textCol, idCol, counts, totals, meta.dim)
  }
}
