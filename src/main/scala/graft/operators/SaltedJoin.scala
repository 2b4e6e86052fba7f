package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard remedy when one join key dominates
  * the fact side (one product is 90% of the events, one return flag is
  * a third of lineitem): a plain shuffle join lands every hot-key row
  * in ONE task while the rest of the cluster idles. Salting spreads
  * the hot side across `salts` synthetic sub-keys and REPLICATES the
  * (small) other side once per salt, so the join runs on
  * (key, salt) — the hot key's rows occupy `salts` tasks instead of
  * one, at the cost of a `salts`× blow-up of the replicated side
  * (which is why that side must be the small one; a big-big skewed
  * join wants AQE's skew-join split instead, which this library leaves
  * ON by default).
  *
  * The salt is derived from a per-row hash of the HOT side's whole row
  * (`xxhash64(struct(*))` mod salts) — deterministic given the row, no
  * RNG, and crucially CORRECTNESS-NEUTRAL: every replicated-side row
  * exists at every salt value, so each (hot row, match) pair joins
  * exactly once whatever salt the hot row landed on. Identical hot
  * rows share a salt; that only matters if the corpus is itself one
  * giant duplicate, which is a dedup problem, not a join problem.
  *
  * Supported join types: inner and left_outer (the hot side is
  * preserved; a right/full join would need the salt on the other side
  * — replicate-and-salt the other way around instead). */
object SaltedJoin {

  def saltedJoin(hot: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // normalize Spark's accepted spellings ("left", "leftouter",
    // "LEFT_OUTER", …) before the whitelist check
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(jt == "inner" || jt == "leftouter" || jt == "left",
      s"saltedJoin supports inner/left_outer, got $joinType " +
        "(salt the other side for right/full)")
    require(hot.columns.contains(key) && small.columns.contains(key),
      s"both sides need the join column '$key'")
    val clash = (hot.columns ++ small.columns).contains("__salt")
    require(!clash, "join sides must not already carry a __salt column")
    // hot(name), not col(name): a column literally named "user.id"
    // must resolve as itself, not as a struct-field path
    val saltedHot = hot.withColumn("__salt",
      pmod(xxhash64(struct(hot.columns.map(hot(_)): _*)), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedHot.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
