package graft

import graft.queries.Registry
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, spec'd: SparkEntry.entry produces rows, every
  * oracle key names a registered query, names are unique, and the bench
  * subset is non-empty. Failures here break the driver gates before any
  * operator logic is at fault. */
class EntryContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry: flagship replay returns rows on the smoke-scale table") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry invariants: unique names, oracle keys subset, bench non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(Registry.all.count(_.bench) >= 17)
    // every registered query has an oracle — the correctness gate covers
    // the WHOLE surface, not a subset (update this if a genuinely
    // non-SQL-expressible op ever lands)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
