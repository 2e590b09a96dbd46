package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate compares `SparkEntry.queries` output
  * against `SparkEntry.oracleSql` by KEY — a query without an oracle
  * silently downgrades to a rows-only check, and an oracle without a
  * query is dead weight. Keep the two maps in lockstep so coverage
  * can only be lost loudly.
  */
class GateContractSpec extends AnyFunSuite {

  test("every gate query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL is DuckDB-parseable shape: non-empty, no stray tabs that break the driver's JSON") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
    }
  }
}
