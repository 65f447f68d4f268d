package graft

/** Plan-shape regression tests: the scale properties documented in PLANS.md,
  * asserted on the physical plans so a refactor can't silently lose them.
  */
class PlanAssertionsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0).queryExecution.executedPlan.toString

  test("q1: shipdate predicate pushed to the parquet scan, columns pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushdown in:\n$p")
    assert(!p.contains("l_orderkey"), "scan reads unneeded columns")
  }

  test("q5: every dimension joins as broadcast, fact side never shuffled for joins") {
    val p = plan("q5_local_supplier")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dimension join fell back to SMJ")
  }

  test("range join is a keyed join, not a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated:\n$p")
  }

  test("exact dedup shuffles digests (not text) with map-side group limit") {
    val p = plan("d_dedup_exact")
    assert(p.contains("WindowGroupLimit"), "no partial top-1 before shuffle")
    // the exchange's input schema is (doc_id, _w0 digest) — text is projected
    // away before the shuffle
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(_w0")
    assert(exchangeIdx >= 0, s"unexpected shuffle key:\n$p")
  }

  test("as-of join is one windowed pass — no self-join") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), s"as-of join materialized a join:\n$p")
  }
}
