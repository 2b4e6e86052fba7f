package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted equi-join: result identical to the plain join (inner and
  * left, matched and unmatched keys), and the hot key's rows measured
  * ACTUALLY SPREAD across partitions where the plain join funnels them
  * into one task. */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of the fact side is one key; the tail spreads over keys 90-98,
  // of which 94 has NO dim match (the unmatched-left case)
  private def facts = spark.range(20000).select(
    when(col("id") % 20 < 18, lit(7L)).otherwise(col("id") % 9 + 90)
      .as("k"),
    (col("id") * 13 % 1000).as("v"))
  private def dim = Seq((7L, "hot"), (90L, "a"), (91L, "b"), (92L, "c"),
    (93L, "d"), (95L, "f"), (96L, "g"), (97L, "h"),
    (98L, "i")).toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("inner and left results == the plain join, row for row") {
    // fixture sanity: the seam must see MANY matched non-hot keys,
    // not just the hot one (a salt bug on cold keys must not hide)
    assert(facts.select("k").distinct().count() >= 9)
    val plainInner = facts.join(dim, Seq("k"), "inner")
    val saltedInner = SaltedJoin.saltedJoin(facts, dim, "k", salts = 8)
    assert(canon(saltedInner) == canon(plainInner))
    assert(saltedInner.select("k").distinct().count() >= 8,
      "matched cold keys must flow through the salt seam")
    // left: key 94 has no match — its rows must survive with null name
    val plainLeft = facts.join(dim, Seq("k"), "left_outer")
    val saltedLeft = SaltedJoin.saltedJoin(facts, dim, "k", salts = 8,
      joinType = "leftouter") // Spark's canonical spelling, normalized
    assert(canon(saltedLeft) == canon(plainLeft))
    assert(saltedLeft.filter(col("k") === 94L && col("name").isNull)
      .count() > 0, "unmatched hot-side keys must survive a left join")
  }

  test("the hot key's rows spread across tasks (plain join funnels them)") {
    // AQE off so partition boundaries are the raw shuffle's; broadcast
    // off so the join actually shuffles
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def maxPartFrac(df: org.apache.spark.sql.DataFrame): Double = {
        val sizes = df.withColumn("__pid", spark_partition_id())
          .groupBy("__pid").count().collect().map(_.getLong(1))
        sizes.max.toDouble / sizes.sum
      }
      val plain = maxPartFrac(facts.join(dim, Seq("k"), "inner"))
      val salted = maxPartFrac(
        SaltedJoin.saltedJoin(facts, dim, "k", salts = 8))
      assert(plain > 0.8,
        f"fixture must funnel the plain join (got $plain%.2f)")
      assert(salted < 0.4,
        f"salting must spread the hot key (got $salted%.2f vs $plain%.2f)")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("contracts: bad join type, missing key, salt clash are refused") {
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedJoin(facts, dim, "k", 8, joinType = "left_semi")
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedJoin(facts, dim, "nope", 8)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedJoin(facts.withColumn("__salt", lit(1)), dim, "k", 8)
    }
  }

  test("right and full results == the plain join, row for row") {
    // key 999 exists only on the replicated side (the unmatched-right
    // case a per-salt replica would surface 8 times); key 94 exists
    // only on the hot side (the unmatched-left case full must keep)
    val dimPlus = dim.unionByName(Seq((999L, "z")).toDF("k", "name"))
    val plainRight = facts.join(dimPlus, Seq("k"), "right_outer")
    val saltedRight = SaltedJoin.saltedJoin(facts, dimPlus, "k", salts = 8,
      joinType = "right_outer")
    assert(canon(saltedRight) == canon(plainRight))
    assert(saltedRight.filter(col("k") === 999L).count() == 1L,
      "an unmatched replicated-side row must appear exactly once")
    val plainFull = facts.join(dimPlus, Seq("k"), "full_outer")
    val saltedFull = SaltedJoin.saltedJoin(facts, dimPlus, "k", salts = 8,
      joinType = "full")
    assert(canon(saltedFull) == canon(plainFull))
    assert(saltedFull.filter(col("k") === 94L && col("name").isNull)
      .count() > 0, "full must keep unmatched hot-side rows too")
  }

  test("autoSalts sizes from the bounded hot-key probe") {
    // hot key 7 holds 18,000 of 20,000 rows -> ceil(18000/1000) = 18
    assert(SaltedJoin.autoSalts(facts, "k", targetPerSalt = 1000,
      maxSalts = 64) == 18)
    // clamped at maxSalts when the target is tiny
    assert(SaltedJoin.autoSalts(facts, "k", targetPerSalt = 1,
      maxSalts = 16) == 16)
    // a uniform side needs no salting at a sane target
    val uniform = spark.range(20000).select((col("id") % 1000).as("k"))
    assert(SaltedJoin.autoSalts(uniform, "k", targetPerSalt = 1000,
      maxSalts = 64) == 1)
  }
}
