package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency of the driver contract surface: every oracle belongs to a
  * real query, and the rows-only set stays the documented singleton
  * (q57 — float-aggregation order in k-means; Oracles scaladoc).
  */
class EntrySpec extends AnyFunSuite {

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are exactly the documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q57_knn_ivf"), s"undocumented rows-only: $rowsOnly")
  }

  test("generated oracle SQL is single-statement and ordered") {
    Oracles.generated.foreach { case (name, sql) =>
      assert(!sql.trim.endsWith(";"), s"$name ends with ';'")
      assert(!sql.contains(";"), s"$name contains a statement separator")
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name lacks ORDER BY")
    }
  }
}
