package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over every registered query at sf0.001: runs, has a schema, and
  * (except anti-join shapes that can legitimately be empty at tiny SF)
  * returns rows. The full value-level gate is the DuckDB oracle compare
  * (tools/verify_local.py / the driver's CORRECTNESS run). */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val mayBeEmpty = Set("q04_never_sold")

  test("query names are unique and every oracle key has a query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  (Registry.all ++ Registry.benchExtras).foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, TestSpark.sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every registered query is oracle-checked (no rows-only gaps)") {
    val unchecked = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(unchecked.isEmpty, s"queries without oracle: $unchecked")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
