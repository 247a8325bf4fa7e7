package graft

/** Plan-quality regression guard: the physical plans that make these
  * operators scale must not silently degrade — pushdown reaching the
  * parquet scan, dimension sides broadcast, the asof union-merge staying
  * a single key shuffle, aggregates keeping their partial (map-side)
  * phase.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to the scan, partial+final aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_join_inner: dimension side broadcast, fact filter pushed") {
    val p = plan("q_join_inner")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThan(o_totalprice,450000.0)"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_asof_join: exactly one hash shuffle (the key), filters pushed to both scans") {
    val p = plan("q_asof_join")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1)
    assert("EqualTo\\(event_type,purchase\\)".r.findAllIn(p).nonEmpty)
    assert("EqualTo\\(event_type,click\\)".r.findAllIn(p).nonEmpty)
  }

  test("q_latest_on: partial max_by aggregation, no sort of the fact table") {
    val p = plan("q_latest_on")
    assert(p.contains("partial_max_by") || p.contains("partial_finalmerge") || p.contains("HashAggregate"))
    assert(!p.contains("Window ")) // hash-agg lowering, not a row_number window
  }

  test("q_asof_native: custom AsOfJoinExec planned, one hash exchange per side, no window") {
    val p = plan("q_asof_native")
    assert(p.contains("AsOfJoin ")) // AsOfJoinExec renders without the suffix
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 2)
    assert(!p.contains("Window "))
  }

  test("q_orderby_limit: top-k, not a full global sort") {
    val p = plan("q_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_sql_interval_scan: dialect interval literal reaches the scan as pushed range") {
    val p = plan("q_sql_interval_scan")
    assert(p.contains("GreaterThanOrEqual(ts") || p.contains("(ts#"))
    assert(p.contains("PushedFilters"))
    // the rewrite produced a range predicate, not a full scan + filter
    assert(p.contains("IsNotNull(ts)") || p.contains("GreaterThanOrEqual"))
  }

  test("q_filter_project: column-pruned scan") {
    val p = plan("q_filter_project")
    // only the referenced lineitem columns reach the reader
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey"))
    assert(!p.contains("l_suppkey"))
  }
}
