package graft

/** Plan-shape regression guards: the scale properties SCALE.md documents
  * (pushdown, pruning, top-k without global sort, broadcast dims) must
  * survive refactors. These assert on the optimized/physical plan text,
  * not on timings. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("p1: base-column predicate reaches the parquet scan; columns pruned") {
    val p = plan("p1_quality_filter")
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,30)]"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,n_chars:bigint>"), p)
  }

  test("o1: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("o1_topk_by_score")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("h3: dimension join broadcasts; top-k at the end") {
    val p = plan("h3_top_customers_by_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("h1: aggregation is two-phase (map-side partial)") {
    val p = plan("h1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("a4: events scan prunes to the two needed columns") {
    val p = plan("a4_daily_trends")
    assert(p.contains("ReadSchema: struct<ts:bigint,event_type:string>"), p)
  }
}
