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
  * Supported join types: inner and left_outer run as ONE salted pass
  * (the preserved side is the salted one, so outer semantics are free).
  * right_outer and full_outer preserve rows on the REPLICATED side(s),
  * where a replica-per-salt would surface each unmatched row `salts`
  * times — so they run as the salted INNER pass plus anti-join
  * null-extension legs: unmatched `small` rows via a left_anti against
  * the hot side's distinct keys (a narrow partial-aggregated shuffle),
  * and for full_outer unmatched `hot` rows via a left_anti against the
  * small side's keys (broadcastable by the same smallness that made
  * replication affordable). The hot side is scanned twice on those
  * paths — the honest price of preserving the replicated side. */
object SaltedJoin {

  def saltedJoin(hot: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // normalize Spark's accepted spellings ("left", "leftouter",
    // "LEFT_OUTER", …) before the whitelist check
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(Set("inner", "leftouter", "left", "rightouter", "right",
        "fullouter", "full", "outer").contains(jt),
      s"saltedJoin supports inner/left_outer/right_outer/full_outer, got $joinType")
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
    def salted(tpe: String) =
      saltedHot.join(replicated, Seq(key, "__salt"), tpe).drop("__salt")
    /** `df` null-extended to the inner join's (key, hot-rest,
      * small-rest) column order, with `fromHot` saying which side's
      * columns `df` carries. */
    def nullExtended(df: DataFrame, fromHot: Boolean): DataFrame = {
      def side(cols: Array[String], schema: org.apache.spark.sql.types.StructType,
               present: Boolean) =
        cols.filter(_ != key).map { c =>
          if (present) df(c)
          else lit(null).cast(schema(c).dataType).as(c)
        }
      df.select(df(key) +:
        (side(hot.columns, hot.schema, fromHot) ++
          side(small.columns, small.schema, !fromHot)): _*)
    }
    jt match {
      case "inner" | "leftouter" | "left" => salted(jt)
      case "rightouter" | "right" =>
        salted("inner").unionByName(nullExtended(
          small.join(hot.select(hot(key)).distinct(), Seq(key), "left_anti"),
          fromHot = false))
      case _ => // fullouter / full / outer
        salted("inner")
          .unionByName(nullExtended(
            small.join(hot.select(hot(key)).distinct(), Seq(key), "left_anti"),
            fromHot = false))
          .unionByName(nullExtended(
            hot.join(broadcast(small.select(small(key)).distinct()),
              Seq(key), "left_anti"),
            fromHot = true))
    }
  }

  /** Pick `salts` from a BOUNDED hot-key probe: candidate hot keys come
    * from the `freqItems` sketch at support `targetPerSalt / n` (any
    * key hot enough to need >1 salt exceeds that fraction, so it
    * surfaces; sketch state is ~1/support ≤ min(n/targetPerSalt, 10^4)
    * entries — no full groupBy materializes), their frequencies are
    * then counted exactly (a map-only isin filter plus a
    * candidate-bounded aggregate), and salts = ceil(maxFreq /
    * targetPerSalt) clamped to [1, maxSalts]. Returns 1 (plain join)
    * when no key is hot enough.
    *
    * HONEST BOUND: Spark's sketch floors support at 1e-4, so past
    * n > 10^4 · targetPerSalt rows a key between targetPerSalt and
    * n/10^4 occurrences can escape the probe — the helper WARNS loudly
    * when that regime is entered (raise targetPerSalt proportionally,
    * or size salts explicitly). Below that corpus size the sketch's
    * guarantee is exact: a missed key is one that did not need
    * salting. */
  def autoSalts(hot: DataFrame, key: String,
                targetPerSalt: Long = 1L << 20,
                maxSalts: Int = 64): Int = {
    require(targetPerSalt >= 1, s"targetPerSalt must be >= 1, got $targetPerSalt")
    require(maxSalts >= 1, s"maxSalts must be >= 1, got $maxSalts")
    val n = hot.count()
    if (n == 0 || targetPerSalt >= n) return 1
    val want = targetPerSalt.toDouble / n
    val floor = 1e-4
    if (want < floor)
      System.err.println(
        f"[graft] autoSalts: $n%,d rows put the needed sketch support " +
          f"$want%.2e below the freqItems floor $floor%.0e — keys between " +
          f"$targetPerSalt%,d and ${(floor * n).toLong}%,d occurrences can " +
          "escape this probe; raise targetPerSalt proportionally or size " +
          "salts explicitly at this scale")
    val cands = hot.stat.freqItems(Array(key), math.max(want, floor))
      .head().getSeq[Any](0).filter(_ != null)
    if (cands.isEmpty) 1
    else {
      val maxFreq = hot.filter(col(key).isin(cands: _*))
        .groupBy(col(key)).count()
        .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
      val want = (maxFreq + targetPerSalt - 1) / targetPerSalt
      math.min(math.max(want, 1L), maxSalts.toLong).toInt
    }
  }
}
