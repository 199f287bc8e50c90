package graft

/** Plan-shape invariants as tests: the scale posture PlanAudit prints
  * (pushdown to the scan, broadcast dims, hash joins instead of
  * nested loops, TakeOrdered instead of global sorts) must survive any
  * refactor, not just be observed once. Planning only — nothing runs. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Query plan PLUS the formatted build plans of every memo the query
    * touched — since round 14 the family memos eagerly localCheckpoint
    * (consumers read a LogicalRDD leaf), so the build subtree's shape
    * lives in CacheBook's recorded build plans, not the consumer plan. */
  private def planWithBuilds(name: String): String = {
    val (df, touched) = CacheBook.traced { SparkEntry.queries(name)(spark, dir) }
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode) + "\n" +
      touched.map { case (sc, nm) => CacheBook.buildPlan(spark, sc, nm) }
        .mkString("\n")
  }

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
    val p = planWithBuilds("x_lm_score")
    assert(p.contains("__salt"), "count join must carry the salt key")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_ivf_ann: constant-K centroid draw; assignment is the bank expression") {
    // the centroid subtree must carry a global Limit (constant in
    // corpus size); since round 15 the assignment itself is the
    // nearest_centroids constant-bank expression — no N×K join rows,
    // no per-vector window sort may reappear in the cells build
    val p = planWithBuilds("s_ivf_ann")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      "centroids must be a LIMIT-K sample")
    assert(p.contains("nearest_centroids"),
      "assignment must be the constant-bank argmax expression")
    assert(!p.contains("CartesianProduct"), "never shuffle N x K")
  }

  test("x_bpe_encode: the encode is pure codegen over the distinct-word relation") {
    // the chained merge replaces ride as result EXPRESSIONS of the
    // distinct-word aggregate (simple toString elides those — read the
    // formatted plan), never as typed lambdas deserializing to objects
    val pf = planWithBuilds("x_bpe_encode")
    assert(pf.contains("replace("), pf.take(600))
    assert(!pf.contains("DeserializeToObject") && !pf.contains("MapElements"),
      "encode must stay in whole-stage codegen — no object pipeline")
    assert(pf.contains("__salt"), "the Zipf vocab join must carry the salt key")
    graft.CacheBook.releaseAll(spark)
  }

  test("x_dup_spans / x_span_strip: window keys are hashed and the df join salted") {
    val pd = planOf("x_dup_spans")
    assert(pd.contains("__salt"), "window-df join must carry the salt key")
    val ps = planOf("x_span_strip")
    assert(ps.contains("__salt"), "span-stat join must carry the salt key")
    assert(!ps.contains("CartesianProduct") && !pd.contains("CartesianProduct"))
  }

  test("s_hybrid_rrf: the NQueries-doc word side broadcasts; no cartesian blowup") {
    // the embedded brute-force baseline (bfTopk) carries its intended
    // O(N*NQueries) BroadcastNestedLoopJoin (5 broadcast rows, same as
    // s_cosine_topk) — the LEXICAL side and the fusion must still be
    // broadcast/equi-join shaped, and nothing may plan a cartesian
    val p = planWithBuilds("s_hybrid_rrf")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "query-word side must broadcast")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_knn_graph: per-vector windows stay partitioned; no cartesian, no single-partition") {
    // the all-vectors probe and the top-k both window on src — a
    // SinglePartition window here would serialize the whole corpus
    // through one task; candidates must come from the cid equi-join
    val p = planWithBuilds("s_knn_graph")
    assert(p.contains("windowspecdefinition(src"), p.take(600))
    // guard the EXCHANGE form specifically: a K-row checkpointed
    // centroid leaf legitimately reports SinglePartition as its
    // output partitioning (Scan ExistingRDD), which is not a collapse
    assert(!p.contains("Exchange SinglePartition"),
      "per-vector work must stay partitioned")
    assert(!p.contains("CartesianProduct"), "candidates are cell-bounded, never all-pairs")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_nn_descent: candidates come from edge-list equi-joins on the memoized graph") {
    // the 2-hop expansion must be a self-equi-join of the KnnK*N edge
    // list read from the memo, the re-rank window partitioned on src —
    // no cartesian, no single-partition collapse
    val p = planWithBuilds("s_nn_descent")
    assert(p.contains("Scan ExistingRDD"),
      "seed graph must be read from the checkpointed memo")
    assert(p.contains("windowspecdefinition(src"), p.take(600))
    assert(!p.contains("CartesianProduct"), "candidates are graph-bounded, never all-pairs")
    // exchange form only — K-row checkpoint leaves report
    // SinglePartition output partitioning without being a collapse
    assert(!p.contains("Exchange SinglePartition"),
      "per-vector work must stay partitioned")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_graph_rank: iteration joins stay equi-shaped; no cartesian") {
    // the O(N*K) BroadcastNestedLoopJoins in the MEMOIZED knn lineage
    // are the intended constant-K centroid assignment (same plan class
    // as s_ivf_ann); the iteration itself must be pure equi-join —
    // nothing may plan a cartesian, and the per-iteration base-case
    // join is the LeftOuter against the contribution aggregate
    val p = planWithBuilds("s_graph_rank")
    assert(!p.contains("CartesianProduct"), "rank propagation is edge-join only")
    assert(p.contains("LeftOuter"), "missing-inlink base case must be a left join")
    // edges⋈deg is memoized persisted: every iteration must read the
    // SAME in-memory relation — re-aggregating deg per iteration is the
    // r7 scale nit this guards against
    assert(p.contains("Scan ExistingRDD"),
      "ed must be read from the checkpointed memo")
    // the one allowed deg aggregation is the cached build INSIDE the
    // printed InMemoryRelation lineage; un-memoized, the aggregate
    // subtree would repeat once per iteration. NOTE: this anchors on
    // Spark's plan-string format ("AS deg#") and on checkpoint
    // truncation keeping at most one printed copy of the cached
    // lineage — a Spark version bump or RankIters change can flip it
    // without a real regression; if it fires, eyeball the plan before
    // treating it as one.
    assert(p.linesIterator.count(_.contains("AS deg#")) <= 1,
      "deg must aggregate once (in the memo build), not per iteration")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_nn_descent_k: per-round checkpoints bound the plan; no cartesian") {
    // each round's 2-hop self-join references the previous graph twice —
    // without the per-round eager checkpoint the plan would nest
    // exponentially in rounds. The final curve must read checkpointed
    // RDDs (Scan ExistingRDD) + the memoized brute-force baseline, and
    // nothing may plan a cartesian.
    val p = planWithBuilds("s_nn_descent_k")
    assert(!p.contains("CartesianProduct"), "candidates are graph-bounded, never all-pairs")
    assert(p.contains("Scan ExistingRDD"),
      "rounds must read per-round checkpoints (and the bf memo leaf)")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_graph_search: walk is edge equi-joins over the memoized graph; no cartesian") {
    // the only unconditioned join is the NQueries x SearchSeeds seed
    // pair-up (broadcast nested loop of two tiny frames — the
    // scalar-subquery shape); expansion joins must stay equi-shaped
    // and the result reads from the memo.
    val p = planWithBuilds("s_graph_search")
    assert(!p.contains("CartesianProduct"), "beam expansion must be an edge equi-join")
    assert(p.contains("Scan ExistingRDD"), "result must be memoized (checkpoint leaf)")
    graft.CacheBook.releaseAll(spark)
  }

  test("m_decode: one scan into one mapPartitions pass; only the gate-sort exchange") {
    val p = planOf("m_decode")
    assert(p.split("Scan parquet").length - 1 == 1, p.take(600))
    assert(p.contains("MapPartitions"), "decode must run as a batched mapPartitions stage")
    assert(p.split("Exchange").length - 1 <= 2, // range sort (+AQE read)
      "no shuffle before the gate sort")
  }

  test("x_gopher_filter: pure scalar pipeline — no join, no aggregate, one scan") {
    // every rule evaluates per row at the scan; the only exchange is
    // the gate's final range sort. A join or aggregation here would
    // mean the filter stopped scaling with the scan.
    val p = planOf("x_gopher_filter")
    assert(p.split("Scan parquet").length - 1 == 1, p.take(600))
    assert(!p.contains("Join"), "keep/drop decision must be per-row scalar")
    assert(!p.contains("HashAggregate"), "no aggregation in a row-local filter")
  }

  test("x_corpus_diff: snapshots collapse to (key, hash) before the full-outer join") {
    val p = planOf("x_corpus_diff")
    assert(p.contains("FullOuter"), "diff must plan a full-outer join")
    // the text column must be hashed at the scan projection — only the
    // 16-byte fingerprint crosses the exchange, never the document body
    // (in the printed tree, join INPUTS appear after the join line)
    val joinAt = p.indexOf("FullOuter")
    assert(p.drop(joinAt).contains("md5"),
      "fingerprint must be computed below the join")
    val exchanged = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    assert(exchanged.forall(l => !l.contains("text#")),
      "the raw text column must never cross a shuffle")
  }

  test("s_mmr: greedy rounds read checkpointed selections; no cartesian") {
    // the pool and pair relations are bounded (NQueries x MmrPool²,
    // corpus-independent) and every greedy round is equi-joins over
    // them; each round's selected set references the previous twice, so
    // the final frame must read per-round checkpoints, never re-derive
    val p = planOf("s_mmr")
    assert(!p.contains("CartesianProduct"),
      "pairwise similarities must equi-join on q, never all-pairs")
    assert(p.contains("Scan ExistingRDD"),
      "rounds must read the per-round checkpointed selection")
    graft.CacheBook.releaseAll(spark)
  }

  test("x_dsir: the fixed-size weight table broadcasts; feature stream is memoized") {
    // the hashed-feature space is DsirBuckets rows whatever the corpus
    // size — the per-doc scoring join must plan as a broadcast hash
    // join (a shuffle here would move the corpus-sized feature stream
    // twice), and the exploded feature relation is CHECKPOINTED (round
    // 14: eager localCheckpoint, not persist — the plan-tax fix) so
    // the count pass and the probe share one materialization
    val p = planWithBuilds("x_dsir")
    assert(p.contains("BroadcastHashJoin"),
      "the bucket-weight lookup must broadcast")
    assert(p.contains("Scan ExistingRDD"),
      "the feature stream must come from the one materialized relation")
    assert(!p.contains("CartesianProduct"),
      "only the 1-row totals pair-up may be unconditioned")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_hnsw_search: both layers walk by edge equi-joins; no cartesian") {
    // layer 1 is the induced subgraph of the MEMOIZED layer-0 graph
    // (two semi-shaped equi-joins on the promoted set) and both walks
    // expand strictly along edges; the only unconditioned pair-up is
    // the broadcast qs x seeds scalar-frame product
    val p = planOf("s_hnsw_search")
    assert(!p.contains("CartesianProduct"),
      "walks must expand along edges, never all-pairs")
    assert(p.contains("Scan ExistingRDD"),
      "rounds must read checkpointed beams")
    graft.CacheBook.releaseAll(spark)
  }

  test("s_phrase: phrase terms broadcast against one posting scan; no corpus self-join") {
    // the intersect-by-offset trick means exactly ONE join (the tiny
    // (q, j, w) phrase relation broadcast onto the positional postings)
    // — a per-term self-join of the posting list would plan multiple
    // corpus scans and shuffle them on word keys
    val p = planOf("s_phrase")
    assert(p.contains("BroadcastHashJoin"),
      "the phrase relation must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "postings must never shuffle on the word key")
    assert(p.split("Scan parquet").length - 1 == 2,
      "exactly two scans: postings + the NQueries phrase slice")
    assert(!p.contains("CartesianProduct"))
  }

  test("slice_fk_audit: one scan per child table, not per FK edge") {
    // 7 edges over 5 child tables + 7 parent-key scans = 12 scans;
    // the per-edge shape scanned lineitem three times (14 total)
    val p = planOf("slice_fk_audit")
    assert(p.split("Scan parquet").length - 1 == 12,
      s"expected 12 scans (5 children + 7 parents), plan:\n${p.take(600)}")
  }

  test("quantile fences plan NO Percentile aggregate (bounded-histogram only)") {
    // the unbounded `percentile()` fence idiom buffers the full
    // distinct-value multiset in ONE aggregate node — the scale-killer
    // BoundedPercentile replaced. These five plans must never regress
    // to it. (The deliberate exceptions remain q_percentile — the gate
    // entry FOR the exact aggregate — and q_approx_quantile's
    // error-bound validation, both over bounded TPC-H column domains.)
    for (name <- Seq("q_outliers", "q_equidepth", "q_pareto", "q_mad",
        "s_knn_outlier")) {
      val p = planOf(name)
      assert(!p.toLowerCase.contains("percentile("),
        s"$name must fence via BoundedPercentile, found percentile() in plan")
      // the fence input and the pass-1 cumulative relation are
      // checkpointed — the plan must read them, not recompute
      assert(p.contains("Scan ExistingRDD"),
        s"$name must read its checkpointed fence relations")
    }
    graft.CacheBook.releaseAll(spark)
  }

  test("s_bq_topk / s_mrl_topk: coarse window is partial-limited and slim") {
    for (name <- Seq("s_bq_topk", "s_mrl_topk")) {
      val p = planWithBuilds(name)
      // rank-filter pushdown: the top-C cut must run map-side BEFORE
      // the coarse exchange, not only after — at corpus scale the
      // difference is shuffling C rows/query/partition vs N rows
      assert(p.contains("WindowGroupLimit"),
        s"$name coarse top-C must plan a WindowGroupLimit")
      // one CHECKPOINTED signature relation feeds queries, coarse pass
      // and rescore — never a recomputed projection per consumer
      assert(p.contains("Scan ExistingRDD"), s"$name must reuse the memo")
      // vectors must not ride the coarse shuffle: the rescore pulls
      // them back via hash joins on the slim candidate frame
      assert(p.contains("BroadcastHashJoin"), s"$name rescore joins")
    }
    graft.CacheBook.releaseAll(spark)
  }

  test("m_scenes: one shuffle to per-video windows; both windows share it") {
    val p = planOf("m_scenes")
    // lag + running-sum windows both partition by doc_id, so the plan
    // needs exactly two exchanges: the window shuffle + the gate sort
    assert(p.split("Exchange").length - 1 <= 3, p.take(800))
    assert(!p.contains("SinglePartition"),
      "per-video windows must never collapse to one partition")
  }

  test("st_ann_ingest: standing side persisted; probe has no state store") {
    // the returned frame is the memory-sink readout; the invariant that
    // matters here is buildable without running a stream — the probe
    // pipeline side is covered by AnnIngestSpec. Assert the standing
    // assignment reuses the family cache release discipline instead.
    val S = graft.queries.Similarity
    val e = S.vecs(spark, dir)
    val tNew = e.agg(org.apache.spark.sql.functions.max("vec_id"))
      .head().getLong(0) * 4 / 5
    val seed = e.filter(org.apache.spark.sql.functions.col("vec_id") < tNew)
      .orderBy(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("vec_id").cast("string")),
        org.apache.spark.sql.functions.col("vec_id"))
      .limit(S.NCentroidsFloor)
      .selectExpr("vec_id AS cid", "v AS cv", "n AS cn")
    val p = S.assignTo(e, seed).queryExecution.executedPlan.toString
    // the argmax is a windowed rank over the broadcast centroid join —
    // an equi-free small-table join plans as BroadcastNestedLoopJoin
    // (24-row build side), never a shuffled cartesian
    assert(!p.contains("CartesianProduct"), p.take(600))
    graft.CacheBook.releaseAll(spark)
  }
}
