package graft

/** Plan-shape invariants as tests: the scale posture PlanAudit prints
  * (pushdown to the scan, broadcast dims, hash joins instead of
  * nested loops, TakeOrdered instead of global sorts) must survive any
  * refactor, not just be observed once. Planning only — nothing runs. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_filter_pushdown: filters and pruned columns reach the parquet scan") {
    val p = planOf("q_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
    assert(!p.contains("l_extendedprice"), "untouched columns must not be read")
  }

  test("q5_join: every dimension joins as a broadcast hash join") {
    val p = planOf("q5_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_range_join: bucketed range join is a hash join, not a nested loop") {
    val p = planOf("q_range_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"), "range predicate must not planned as NL join")
  }

  test("q_topk: order+limit plans TakeOrderedAndProject, no global sort") {
    assert(planOf("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q_semijoin / q_antijoin plan as semi/anti joins, not row-count blowups") {
    assert(planOf("q_semijoin").contains("LeftSemi"))
    assert(planOf("q_antijoin").contains("LeftAnti"))
  }

  test("x_pack: shard-parallel packing — one exchange, pruned scan, no global window") {
    val p = planOf("x_pack")
    // the packing window must partition on shard (parallel) — a window
    // over the whole corpus would plan SinglePartition and serialize
    assert(p.contains("windowspecdefinition(shard"), p.take(600))
    assert(!p.contains("SinglePartition"), "packing must never collapse to one partition")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to the two consumed columns")
  }

  test("s_int8_topk: one quantization projection, materialized and reused") {
    // both join sides must read the SAME persisted quantized relation —
    // the quantization expression shows up under an in-memory scan, not
    // recomputed per side
    val p = planOf("s_int8_topk")
    assert(p.contains("InMemoryTableScan"), p.take(600))
    graft.CacheBook.releaseAll(spark)
  }

  test("q_dq_profile: one scan, one aggregation — per-column rows via Generate") {
    val p = planOf("q_dq_profile")
    // all 21 per-column aggregates ride ONE pass; profiling must never
    // plan a scan per column
    assert(p.split("Scan parquet").length - 1 == 1, p.take(600))
    assert(p.contains("Generate explode"), "per-column rows must come from explode")
  }

  test("x_lm_score: the Zipf-skewed bigram count join is salted") {
    val p = planOf("x_lm_score")
    assert(p.contains("__salt"), "count join must carry the salt key")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_ivf_ann: centroid set is a CONSTANT-K limited broadcast") {
    // the assignment cross join is O(N*K) only while K is fixed: the
    // centroid subtree must carry a global Limit (constant in corpus
    // size) and feed the broadcast side of the join
    val p = planOf("s_ivf_ann")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      "centroids must be a LIMIT-K sample")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "assignment must broadcast the K centroids, never shuffle N x K")
  }
}
