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

  test("every registry query emits only scalar top-level columns") {
    // The driver's oracle harness hashes query output through a pandas
    // sort that cannot handle array/map/struct cells (the q_inverted_index
    // regression, CORRECTNESS_r06) — and the local check_oracle.py
    // happens to tolerate Python lists, so only this spec closes the
    // gap mechanically. Plan analysis only; nothing executes.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val sfDir = "/root/testdata/sf0.001"
    val offending = Registry.all.flatMap { q =>
      q.run(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offending.isEmpty,
      s"non-scalar top-level columns break the driver harness:\n  " +
        offending.mkString("\n  "))
  }
}
