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
    * the default-on `assertUniqueIds` guard enforces that LOUDLY (one
    * cheap count-vs-count-distinct aggregate per side, on the narrow
    * id column only): a duplicated id would otherwise fan out the
    * full-outer join into silently duplicated status rows. Pass
    * `assertUniqueIds = false` only when uniqueness is already
    * guaranteed upstream (e.g. the output of an exact-dedup pass) and
    * the two planning-time jobs matter. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   digest: Column, carryCols: Seq[String],
                   assertUniqueIds: Boolean = true): DataFrame = {
    require(!carryCols.contains(idCol),
      s"carryCols must not repeat the id column $idCol")
    val clash = (oldDf.columns ++ newDf.columns).filter(_.startsWith("__sd_"))
    require(clash.isEmpty, s"input already has reserved columns: ${clash.toSet}")
    if (assertUniqueIds) {
      def check(df: DataFrame, tag: String): Unit = {
        val r = df.agg(count(col(idCol)).as("n"),
          countDistinct(col(idCol)).as("nd")).collect()(0)
        require(r.getLong(0) == r.getLong(1),
          s"snapshotDiff: the $tag snapshot has duplicate $idCol values " +
            s"(${r.getLong(0)} non-null rows, ${r.getLong(1)} distinct) — " +
            "a keyed corpus must have unique ids; a duplicated id fans " +
            "out the full-outer join into duplicate status rows")
      }
      check(oldDf, "old")
      check(newDf, "new")
    }
    def side(df: DataFrame, tag: String) =
      df.select(col(idCol).as(s"__sd_id_$tag") +:
        digest.as(s"__sd_dig_$tag") +:
        carryCols.map(c => col(c).as(s"__sd_${tag}_$c")): _*)
    val o = side(oldDf, "o")
    val n = side(newDf, "n")
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
