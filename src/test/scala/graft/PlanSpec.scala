package graft

/** Plan-quality regression guard: the physical plans the engine is
  * designed around must survive refactors — filters/projections pushed
  * to the parquet scan, dims broadcast, purges as broadcast anti-joins.
  * String-matching the executed plan is deliberate: it fails loudly if
  * an innocent-looking change silently de-optimizes a 100 TB query.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    // other suites cache tables in the shared session; a cached
    // relation would replace the parquet scan and hide pushdown
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
  }

  test("pricing summary: shipdate filter + projection pushed to scan") {
    val p = plan("q_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("filter+pick: predicate pushed, only picked columns read") {
    val p = plan("q_filter_pick")
    assert(p.contains("EqualTo(event_type,click)"))
    assert(!p.contains("props")) // column pruning reached the scan
  }

  test("join revenue: all dims broadcast, no sort-merge join") {
    val p = plan("q_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("purge: broadcast LEFT ANTI join") {
    val p = plan("q_purge_antijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("incremental watermark: timestamp range filter pushed to scan") {
    val p = plan("q_incremental_watermark")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"))
  }

  test("dedup delta: partial aggregation before the exchange") {
    val p = plan("q_dedup_delta")
    assert(p.contains("partial_max_by") || p.contains("partial_"))
  }
}
