package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot lifecycle: what changed between crawl N and crawl
  * N+1, and how to roll a base snapshot forward with a delta — the two
  * operations a continuously-refreshed training corpus needs before any
  * dedup/quality pass can be run incrementally.
  *
  * Scale shape (100 TB base, daily-crawl delta):
  *
  * - [[snapshotDiff]] projects BOTH sides down to (id, digest, carry…)
  *   before the full-outer join, so the only shuffled data is one
  *   narrow row per document — text never moves. With both snapshots
  *   stored bucketed by the id column the join is co-partitioned
  *   (zero-shuffle); otherwise it is one sort-merge exchange per side.
  * - [[applyDelta]]'s dead-id side is delta-sized (upserts + deletes),
  *   which is broadcast-small relative to the base in any incremental
  *   regime — AQE plans the anti-join as a broadcast, the base is never
  *   shuffled, and a bucketed base stays bucketed in the output.
  */
object SnapshotOps {

  /** Per-document delta between two full snapshots of one corpus:
    * `added` (id only in `newDf`), `removed` (id only in `oldDf`),
    * `changed` (in both, digests differ), `unchanged`. `digest` is any
    * engine-portable content digest expression evaluated on each side
    * (e.g. [[TextOps.fingerprint]] or [[DedupOps.digest]]); comparing
    * stored digests instead of content keeps the join rows narrow.
    * `carryCols` are passed through (new side wins where present, the
    * old side supplies them for removed docs). Ids must be unique
    * within each snapshot — it is a keyed corpus, not a multiset — and
    * the default-on `assertUniqueIds` guard enforces that LOUDLY and
    * LAZILY: each side carries a per-id window count checked by
    * `assert_true` inside the plan, so construction stays a pure plan
    * builder (no jobs run until the caller acts) and a duplicated id
    * fails the action instead of silently fanning out the full-outer
    * join into duplicated status rows. The window partitions by the
    * same id the join shuffles on, so the check rides the exchange the
    * join needs anyway — no extra aggregate jobs, unlike an eager
    * count-vs-count-distinct probe. Pass `assertUniqueIds = false`
    * only when uniqueness is already guaranteed upstream (e.g. the
    * output of an exact-dedup pass). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   digest: Column, carryCols: Seq[String],
                   assertUniqueIds: Boolean = true): DataFrame = {
    require(!carryCols.contains(idCol),
      s"carryCols must not repeat the id column $idCol")
    val clash = (oldDf.columns ++ newDf.columns).filter(_.startsWith("__sd_"))
    require(clash.isEmpty, s"input already has reserved columns: ${clash.toSet}")
    def side(df: DataFrame, tag: String, sideName: String) = {
      val proj = df.select(col(idCol).as(s"__sd_id_$tag") +:
        digest.as(s"__sd_dig_$tag") +:
        carryCols.map(c => col(c).as(s"__sd_${tag}_$c")): _*)
      if (!assertUniqueIds) proj
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(s"__sd_id_$tag"))
        proj.withColumn("__sd_cnt", count(lit(1)).over(w))
          // assert_true returns NULL on success; filtering on it forces
          // evaluation and keeps every (passing) row
          .filter(assert_true(
            col(s"__sd_id_$tag").isNull || col("__sd_cnt") === 1,
            lit(s"snapshotDiff: the $sideName snapshot has duplicate " +
              s"$idCol values — a keyed corpus must have unique ids; a " +
              "duplicated id fans out the full-outer join into duplicate " +
              "status rows (pass assertUniqueIds = false only when " +
              "uniqueness is guaranteed upstream)")).isNull)
          .drop("__sd_cnt")
      }
    }
    val o = side(oldDf, "o", "old")
    val n = side(newDf, "n", "new")
    val status = when(col("__sd_id_o").isNull, "added")
      .when(col("__sd_id_n").isNull, "removed")
      .when(col("__sd_dig_o") =!= col("__sd_dig_n"), "changed")
      .otherwise("unchanged")
    o.join(n, col("__sd_id_o") === col("__sd_id_n"), "full_outer")
      .select(coalesce(col("__sd_id_n"), col("__sd_id_o")).as(idCol) +:
        status.as("status") +:
        carryCols.map(c =>
          coalesce(col(s"__sd_n_$c"), col(s"__sd_o_$c")).as(c)): _*)
  }

  /** Roll `base` forward by a delta: drop `deleteIds`, replace any row
    * whose id appears in `upserts`, append the upserts. Upserting an
    * unseen id is an insert; deleting an absent id is a no-op — the
    * idempotent semantics a replayed crawl delta needs. `upserts` must
    * share `base`'s schema (matched by name). The dead-id union is
    * delta-sized, so both anti-join probes broadcast and the base never
    * shuffles. */
  def applyDelta(base: DataFrame, upserts: DataFrame, deleteIds: DataFrame,
                 idCol: String): DataFrame = {
    val dead = deleteIds.select(col(idCol))
      .union(upserts.select(col(idCol)))
    base.join(dead, Seq(idCol), "left_anti").unionByName(upserts)
  }
}
