package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's structural contracts — the checks that make a
  * half-landed entry (round 14's r08: registered in `queries`, absent
  * from `oracleSql`, unnoticed for a full round) impossible to ship
  * silently again. */
class VerifyContractSpec extends AnyFunSuite {
  test("every catalog key carries a DuckDB oracle or an explicit " +
    "allowlist membership") {
    assert(SparkEntry.orphanKeys() == Set.empty[String],
      "unoracled queries keys — add oracleSql or RowsOnlyAllowlist + " +
        "a golden spec")
  }

  test("the guard actually fires: a synthetic orphan key is reported") {
    assert(SparkEntry.orphanKeys(
      SparkEntry.queries.keys ++ Seq("zz_synthetic_orphan")) ==
      Set("zz_synthetic_orphan"))
  }

  test("allowlist names only real catalog keys") {
    assert(SparkEntry.RowsOnlyAllowlist.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracles never dangle: every oracleSql key is a queries key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "an oracle for a nonexistent query would silently test nothing")
  }

  test("phase decompositions decompose real catalog entries") {
    assert(SparkEntry.phases.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
