package graft.queries

/** Post-processing applied to every oracle SQL string before it is
  * handed to the DuckDB compare harness.
  *
  * DuckDB (1.0) inlines non-recursive CTEs by default: every reference
  * to a named CTE re-plans and re-executes its body. Oracles that
  * reference an expensive CTE many times — the MMR greedy unroll
  * (i58/i62) chains k steps, each re-reading the candidate and
  * pairwise-sim CTEs, which themselves replay a full IVF assign over
  * the corpus — blow up combinatorially: measured 29 s / 99 s (and
  * out-of-memory under a shared connection) at sf0.01, vs 0.2 s /
  * 0.8 s once each CTE is evaluated exactly once.
  *
  * `AS MATERIALIZED` is the standard DuckDB hint for "evaluate once";
  * it changes evaluation COUNT, never arithmetic, so results are
  * bit-identical (empirically verified over all 194 oracles at
  * sf0.01: identical rows, 36 s total → all sub-second except the
  * recursive trainers). DuckDB accepts the hint on every member of a
  * WITH list, including RECURSIVE ones, so the rewrite is applied
  * blanket.
  *
  * The rewrite targets exactly the CTE-definition shape our builders
  * emit — a lowercase identifier followed by `AS (` — which cannot
  * collide with column aliases (`expr AS name`), derived tables
  * (`(...) AS name`), or casts (`CAST(x AS type)`); none of those put
  * `(` after `AS`. Column-list CTEs (`name(a, b) AS (`) are left
  * inlined on purpose: ours are all small VALUES literals.
  */
object OracleSql {
  private val CteDef = raw"(\b[a-z][a-z0-9_]*\s+AS)\s*\(".r

  def materializeCtes(sql: String): String =
    CteDef.replaceAllIn(sql, m => m.group(1) + " MATERIALIZED (")

  def materializeCtes(oracles: Map[String, String]): Map[String, String] =
    oracles.map { case (k, v) => k -> materializeCtes(v) }
}
