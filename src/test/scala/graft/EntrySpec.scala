package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency of the driver contract surface: every oracle belongs to a
  * real query, and every query has an oracle (q57's integer-exact IVF
  * variant closed the last rows-only gap; Oracles scaladoc).
  */
class EntrySpec extends AnyFunSuite {

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-gated (no rows-only queries)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only queries crept in: $rowsOnly")
  }

  test("generated oracle SQL is single-statement and ordered") {
    Oracles.generated.foreach { case (name, sql) =>
      assert(!sql.trim.endsWith(";"), s"$name ends with ';'")
      assert(!sql.contains(";"), s"$name contains a statement separator")
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name lacks ORDER BY")
    }
  }
}
