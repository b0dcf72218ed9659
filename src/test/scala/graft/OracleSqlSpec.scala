package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.OracleSql

/** The evaluate-CTEs-once oracle rewrite: it must hit every CTE
  * definition our builders emit and nothing else — a false positive
  * would make the rewritten SQL a DuckDB syntax error and fail the
  * round's whole correctness gate at once. */
class OracleSqlSpec extends AnyFunSuite {

  test("CTE definitions gain MATERIALIZED; references do not") {
    val sql = """WITH base AS (
                |  SELECT a FROM t
                |), cand2 AS (SELECT a FROM base)
                |SELECT * FROM cand2""".stripMargin
    val out = OracleSql.materializeCtes(sql)
    assert(out.contains("base AS MATERIALIZED ("))
    assert(out.contains("cand2 AS MATERIALIZED ("))
    // the reference `FROM base` is untouched
    assert(out.contains("SELECT a FROM base)"))
  }

  test("column aliases, derived-table aliases, and CAST are untouched") {
    val sql = "SELECT sum(x) AS total, CAST(y AS BIGINT) AS yy " +
      "FROM (SELECT 1 AS x, 2 AS y) AS sub"
    assert(OracleSql.materializeCtes(sql) == sql)
  }

  test("column-list CTEs stay inlined (small VALUES literals)") {
    val sql = "WITH cells(cell, ctr) AS (VALUES (0, 1)) SELECT * FROM cells"
    assert(OracleSql.materializeCtes(sql) == sql)
  }

  test("RECURSIVE member is rewritten too (DuckDB accepts the hint)") {
    val sql = """WITH RECURSIVE t AS (
                |  SELECT 1 AS n UNION ALL SELECT n + 1 FROM t WHERE n < 3
                |) SELECT sum(n) FROM t""".stripMargin
    assert(OracleSql.materializeCtes(sql).contains("t AS MATERIALIZED ("))
  }

  test("every shipped oracle is fully rewritten (idempotent fixpoint)") {
    // SparkEntry.oracleSql already applied the rewrite; MATERIALIZED is
    // uppercase, so the lowercase-name pattern cannot re-match an
    // already-rewritten definition. A second application changing
    // anything would mean a CTE definition escaped the first pass.
    // (Index-backed oracles like i58 are run-state-dependent — here
    // they are their static stubs — but the fixpoint property is what
    // guarantees the dynamic forms are covered too, since they pass
    // through the same SparkEntry.oracleSql mapping.)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(OracleSql.materializeCtes(sql) == sql,
        s"$name: rewrite not idempotent")
    }
  }
}
