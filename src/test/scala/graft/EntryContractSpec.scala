package graft

import graft.queries.{LlmQueries, MorphlineQueries, RelationalQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry: the three query modules merge
  * with `++`, so name collisions would silently drop queries; every oracle
  * must refer to a real query; the rows-only set must be the known,
  * justified set (COVERAGE.md) and never grow by accident.
  */
class EntryContractSpec extends AnyFunSuite {

  test("query names are disjoint across modules") {
    val m = MorphlineQueries.queries.keySet
    val r = RelationalQueries.queries.keySet
    val l = LlmQueries.queries.keySet
    assert((m & r).isEmpty && (m & l).isEmpty && (r & l).isEmpty,
      s"colliding names: ${(m & r) ++ (m & l) ++ (r & l)}")
    assert(SparkEntry.queries.size == m.size + r.size + l.size)
  }

  test("every oracle key names an existing query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("rows-only queries are exactly the documented justified set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val justified = Set(
      "m_generate_uuid",     // nondeterministic uuid()
      "d_minhash_pairs",     // xxhash64 not in DuckDB
      "d_simhash_pairs",     // xxhash64 not in DuckDB
      "s_knn_lsh",           // hyperplane hash not in DuckDB
      "t_rolling_hash",      // crc32 not in DuckDB
      "t_subword_count",     // regex lookarounds not in RE2
      "t_phonetic_key",      // soundex not in DuckDB
      "q_approx_distinct",   // HLL estimate
      "q_approx_percentile", // KLL estimate
      "q_hll_sketch",        // sketch internals engine-specific
      "mm_decode_features")  // stubbed decoder internals
    assert(rowsOnly == justified,
      s"undocumented rows-only: ${rowsOnly -- justified}; " +
        s"stale justification: ${justified -- rowsOnly}")
  }

  test("every oracle is plain single-statement SQL (driver runs them verbatim)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains(";"), s"$name oracle has a statement separator")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name oracle is not a query")
    }
  }
}
